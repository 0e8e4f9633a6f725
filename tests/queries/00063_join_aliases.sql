SELECT n.n_name AS nat, r.r_name AS reg FROM nation AS n ALL INNER JOIN region AS r ON n.n_regionkey = r.r_regionkey WHERE n.n_nationkey < 5 ORDER BY nat
