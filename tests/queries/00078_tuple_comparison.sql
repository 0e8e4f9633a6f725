SELECT (1, 'a') = (1, 'a') AS eq, (1, 2) < (1, 3) AS lt, (2, 0) > (1, 9) AS gt, (1, 2) != (1, 2) AS ne
