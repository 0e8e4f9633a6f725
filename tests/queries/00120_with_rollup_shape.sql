SELECT number % 2 AS k, sum(number) AS s FROM (SELECT number FROM system.numbers LIMIT 10) GROUP BY k WITH TOTALS HAVING s > 0 ORDER BY k
