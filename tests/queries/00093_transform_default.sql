SELECT transform(number, [2, 4], [20, 40], number * 100) AS t FROM system.numbers LIMIT 6;
SELECT transform(s, ['a', 'b'], ['A', 'B'], 'other') AS ts FROM (SELECT if(number = 0, 'a', if(number = 1, 'b', 'z')) AS s FROM system.numbers LIMIT 3) ORDER BY ts
