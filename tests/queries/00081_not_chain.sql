SELECT NOT 0 AS a, NOT 1 AS b, NOT NOT 1 AS c, NOT NOT NOT 0 AS d;
SELECT count() FROM nation WHERE NOT (n_regionkey = 0)
