SELECT abs(-1) = 1 AS a, abs(-128) = 128 AS b, sqrt(4) = 2 AS c, cbrt(8) = 2 AS d, pow(2, 10) AS e, exp2(8) AS f, exp10(3) AS g;
SELECT round(e(), 4) AS e4, round(pi(), 4) AS pi4, floor(3.7) AS fl, ceil(3.2) AS ce, round(2.5) AS rb;
