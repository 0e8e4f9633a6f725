SELECT 0xFF AS a, 0x10 AS b, 123e2 AS c, 1.5e-2 AS d, 0.1 + 0.2 > 0.3 - 1e-9 AS e;
