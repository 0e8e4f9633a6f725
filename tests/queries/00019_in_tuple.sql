SELECT count() FROM nation WHERE (n_regionkey, n_nationkey % 2) IN ((1, 0), (2, 1));
