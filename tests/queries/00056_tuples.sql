SELECT tuple(1, 'a') AS t, tupleElement(tuple(1, 'a'), 1) AS e1, tupleElement(tuple(1, 'a'), 2) AS e2;
SELECT (n_regionkey, n_nationkey) IN ((1, 1), (2, 7)) AS hit, count() AS c FROM nation GROUP BY hit ORDER BY hit;
