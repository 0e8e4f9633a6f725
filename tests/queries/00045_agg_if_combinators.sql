SELECT countIf(number % 2 = 0) AS ce, sumIf(number, number > 5) AS s, avgIf(number, number < 4) AS a, minIf(number, number > 90) AS m FROM (SELECT number FROM system.numbers LIMIT 100);
