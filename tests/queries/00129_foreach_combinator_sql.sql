SELECT sumForEach(a) AS s, minForEach(a) AS mn, maxForEach(a) AS mx, avgForEach(a) AS av, countForEach(a) AS c FROM (SELECT [1, 2] AS a UNION ALL SELECT [3, 4, 5] AS a)
