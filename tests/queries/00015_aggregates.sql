SELECT count(), uniqExact(n_regionkey), min(n_nationkey), max(n_nationkey) FROM nation;
SELECT quantileExact(0.5)(n_nationkey), argMin(n_name, n_nationkey) FROM nation;
SELECT n_regionkey, arraySort(groupArray(n_nationkey)) AS ks FROM nation GROUP BY n_regionkey ORDER BY n_regionkey;
SELECT countIf(n_regionkey = 0), sumIf(n_nationkey, n_regionkey = 0) FROM nation;
