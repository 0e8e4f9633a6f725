SELECT number % 2 AS k, count() AS c FROM (SELECT number FROM system.numbers LIMIT 8) GROUP BY k, k, k ORDER BY k
