SELECT varSamp(number) AS vs, varPop(number) AS vp, round(stddevSamp(number), 6) AS ss, round(stddevPop(number), 6) AS sp FROM (SELECT number FROM system.numbers LIMIT 11);
SELECT round(corr(x, y), 6) AS r FROM (SELECT number AS x, number * 2 + 1 AS y FROM (SELECT number FROM system.numbers LIMIT 10))
