SELECT n_regionkey, n_name FROM nation ORDER BY n_name LIMIT 1 BY n_regionkey LIMIT 5;
