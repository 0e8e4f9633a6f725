SELECT if(number % 2 = 0, 'even', 'odd') AS p, multiIf(number < 3, 'lo', number < 7, 'mid', 'hi') AS b FROM (SELECT number FROM system.numbers LIMIT 10) ORDER BY number;
SELECT ifNull(NULL, 'dflt') AS a, nullIf(1, 1) AS b, coalesce(NULL, NULL, 3) AS c, assumeNotNull(toNullable(5)) AS d;
