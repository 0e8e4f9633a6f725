SELECT DISTINCT n_regionkey FROM nation ORDER BY n_regionkey DESC;
SELECT DISTINCT n_regionkey % 2 AS p FROM nation ORDER BY p;
