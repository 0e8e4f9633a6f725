SELECT isFinite(1.5) AS f1, isFinite(1e308 * 10) AS f0, isInfinite(1e308 * 10) AS i1, isInfinite(2.0) AS i0, isNaN(sqrt(-1)) AS n1, isNaN(3.5) AS n0
