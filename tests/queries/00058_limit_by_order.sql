SELECT n_regionkey, n_name FROM nation ORDER BY n_regionkey, n_name LIMIT 2 BY n_regionkey;
SELECT n_regionkey, n_name FROM nation ORDER BY n_regionkey, n_name DESC LIMIT 1 BY n_regionkey;
