SELECT val FROM (SELECT n_nationkey AS val FROM nation WHERE n_regionkey = 0 UNION ALL SELECT n_nationkey AS val FROM nation WHERE n_regionkey = 1) ORDER BY val;
SELECT count() FROM (SELECT 1 AS x UNION ALL SELECT 2 UNION ALL SELECT 3);
