SELECT -1 IN (-1) AS a, -1 IN (1, -1, 2) AS b, 1.0 IN (1) AS c, 1.1 IN (1, -1) AS d, 1 IN (3, 2, 1) AS e, materialize(-1) IN (-1) AS f, materialize(1.0) IN (3, 1., -1) AS g;
