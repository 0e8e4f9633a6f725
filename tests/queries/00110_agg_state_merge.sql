SELECT sumMerge(s) AS total FROM (SELECT sumState(number) AS s FROM (SELECT number FROM system.numbers LIMIT 10) UNION ALL SELECT sumState(number) AS s FROM (SELECT number FROM system.numbers LIMIT 5));
SELECT uniqMerge(u) AS uq FROM (SELECT number % 2 AS k, uniqState(number % 7) AS u FROM (SELECT number FROM system.numbers LIMIT 20) GROUP BY k)
