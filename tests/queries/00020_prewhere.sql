SELECT count() FROM orders PREWHERE o_totalprice > 100000 WHERE toYear(o_orderdate) = 1997;
