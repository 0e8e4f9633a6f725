SELECT number, CASE WHEN number % 2 = 0 THEN [1, 2] WHEN number % 3 = 0 THEN [2, 3] ELSE [9] END AS arr FROM system.numbers LIMIT 7;
SELECT number % 2 ? [1,2] : [3] AS t FROM system.numbers LIMIT 3
