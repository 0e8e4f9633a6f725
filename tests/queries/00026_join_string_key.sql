SELECT r_name, n_name FROM (SELECT r_name, r_regionkey FROM region) ALL INNER JOIN (SELECT n_name, n_regionkey AS r_regionkey FROM nation) USING r_regionkey ORDER BY r_name, n_name LIMIT 7;
