SELECT concat('a', 'b', 'c', 'd') AS c4, concat('x', toString(1), 'y', toString(2)) AS cm;
SELECT concat('n=', toString(number), ';') AS s FROM system.numbers LIMIT 3
