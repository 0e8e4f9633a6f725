SELECT 1 IN (1, 2, 3) AS a, 5 IN (1, 2, 3) AS b, 'x' IN ('x', 'y') AS c, 1 NOT IN (1, 2) AS d;
SELECT number IN (1 + 1, 2 * 2) AS hit, count() AS c FROM (SELECT number FROM system.numbers LIMIT 6) GROUP BY hit ORDER BY hit
