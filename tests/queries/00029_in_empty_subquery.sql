SELECT count() FROM (SELECT number FROM system.numbers LIMIT 1000) WHERE 1 IN (SELECT n_nationkey FROM nation WHERE 0);
SELECT count() FROM nation WHERE n_nationkey NOT IN (SELECT n_nationkey FROM nation WHERE 0);
