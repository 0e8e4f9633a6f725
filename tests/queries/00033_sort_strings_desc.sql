SELECT n_name FROM nation ORDER BY n_name DESC LIMIT 6;
SELECT s FROM (SELECT materialize('abc') AS s FROM system.numbers LIMIT 3) ORDER BY s DESC;
