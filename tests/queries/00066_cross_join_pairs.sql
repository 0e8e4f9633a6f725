SELECT a.x AS x, b.y AS y FROM (SELECT number AS x FROM system.numbers LIMIT 3) AS a CROSS JOIN (SELECT number AS y FROM system.numbers LIMIT 2) AS b ORDER BY x, y
