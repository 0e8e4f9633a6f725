SELECT (SELECT count() FROM nation) AS n, (SELECT max(r_regionkey) FROM region) AS m;
SELECT n_name FROM nation WHERE n_regionkey = (SELECT min(r_regionkey) + 1 FROM region) ORDER BY n_name LIMIT 3
