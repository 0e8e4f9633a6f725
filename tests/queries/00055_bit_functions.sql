SELECT bitAnd(12, 10) AS a, bitOr(12, 10) AS o, bitXor(12, 10) AS x, bitNot(0) AS n, bitShiftLeft(1, 8) AS sl, bitShiftRight(256, 4) AS sr, bitTest(5, 0) AS t0, bitTest(5, 1) AS t1;
