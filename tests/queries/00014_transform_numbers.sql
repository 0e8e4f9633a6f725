SELECT transform(number, [3, 5, 7], [111, 222, 333], 9999) AS t FROM system.numbers LIMIT 10;
