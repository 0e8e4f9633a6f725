SELECT a, count() AS c FROM (SELECT if(number % 2 = 0, emptyArrayUInt8(), [1]) AS a FROM system.numbers LIMIT 6) GROUP BY a ORDER BY a
