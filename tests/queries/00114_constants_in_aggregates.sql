SELECT sum(1) AS s1, count(1) AS c1, avg(2) AS a2, max('z') AS mz FROM (SELECT number FROM system.numbers LIMIT 7)
