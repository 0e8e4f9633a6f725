SELECT a, count() AS c FROM (SELECT if(number % 3 = 0, [1, 2], [3]) AS a FROM system.numbers LIMIT 9) GROUP BY a ORDER BY a
