SELECT n_regionkey, count() AS c FROM nation WHERE n_regionkey IN (0, 2, 4) GROUP BY n_regionkey ORDER BY n_regionkey;
SELECT count() FROM customer WHERE c_nationkey IN (SELECT n_nationkey FROM nation WHERE n_regionkey = 1);
