SELECT argMin(n_name, n_nationkey) AS first_name, argMax(n_name, n_nationkey) AS last_name, anyLast(n_regionkey) AS al FROM (SELECT * FROM nation ORDER BY n_nationkey);
