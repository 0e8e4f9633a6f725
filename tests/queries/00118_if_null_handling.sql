SELECT ifNull(NULL, 'dflt') AS d, ifNull('v', 'dflt') AS v, nullIf(1, 1) AS n1, nullIf(1, 2) AS n2, coalesce(NULL, NULL, 3) AS c
