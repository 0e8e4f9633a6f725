SELECT k, c FROM (SELECT number % 2 AS k, count() AS c FROM (SELECT number FROM system.numbers LIMIT 10) GROUP BY k WITH TOTALS) ORDER BY k
