SELECT concat('a', 'b') = 'ab' AS a, concat(materialize('a'), 'b') = 'ab' AS b, concat('{ key: ', 'fn', ', value: ', 'concat', ' }') AS c;
SELECT concat(n_name, '_', r_name) AS nr FROM (SELECT n_name, n_regionkey FROM nation ORDER BY n_nationkey LIMIT 3) ANY LEFT JOIN (SELECT r_regionkey AS n_regionkey, r_name FROM region) USING n_regionkey ORDER BY nr;
