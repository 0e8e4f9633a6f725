SELECT number % 2 AS nk, if(number % 3 = 0, 'fizz', 'plain') AS sk, count() AS c FROM (SELECT number FROM system.numbers LIMIT 12) GROUP BY nk, sk ORDER BY nk, sk
