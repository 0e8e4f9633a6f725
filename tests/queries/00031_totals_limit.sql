SELECT n_regionkey, count() AS c FROM nation GROUP BY n_regionkey WITH TOTALS ORDER BY n_regionkey LIMIT 2;
SELECT n_regionkey, count() AS c FROM nation GROUP BY n_regionkey WITH TOTALS ORDER BY c DESC, n_regionkey LIMIT 3;
