SELECT position('abcdef' AS h, 'cd' AS n) AS p, h, n;
SELECT 3 = countEqual([0 AS x, 1, x, x], x) AS ok;
SELECT 'abc' AS s, s LIKE (concat(s, '%') AS pat) AS m, pat;
SELECT lower('AbC' AS str) = str AS eq
