SELECT intDivOrZero(0, 0) AS a, intDivOrZero(-127, -1) AS b, intDivOrZero(1, 1) AS c, intDivOrZero(4, 2) AS d, intDiv(7, 2) AS e;
