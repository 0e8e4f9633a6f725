SELECT (n_regionkey IN (1, 2)) AS x, count() AS c FROM nation GROUP BY x ORDER BY x;
SELECT (1 IN (0, 2)) AS x FROM system.one GROUP BY x;
