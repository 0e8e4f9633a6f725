SELECT n_name, r_name FROM nation ANY LEFT JOIN (SELECT r_regionkey AS n_regionkey, r_name FROM region) USING (n_regionkey) ORDER BY n_name LIMIT 5;
