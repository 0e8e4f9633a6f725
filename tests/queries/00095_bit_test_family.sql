SELECT bitTest(5, 0) AS t0, bitTest(5, 1) AS t1, bitTest(5, 2) AS t2, bitTestAll(7, 0, 1, 2) AS ta, bitTestAny(4, 0, 1) AS tn, bitTestAny(5, 0, 1) AS ty
