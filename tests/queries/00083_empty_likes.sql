SELECT '' LIKE '' AS a, 'x' LIKE '' AS b, '' LIKE '%' AS c, '' LIKE '_' AS d, 'abc' LIKE 'abc' AS e;
SELECT match('abc', '') AS me, match('', '') AS mee
