SELECT toDate(1412106600) AS big, toDate(42) AS days, toDate('2015-03-01') AS str;
SELECT toYear(toDateTime(1426415400), 'Europe/Moscow') AS y, toString(toDateTime(1426415400), 'Europe/Moscow') AS srendered;
SELECT toTime(toDateTime(1426415400)) AS tt;
SELECT nan != nan AS nn, inf > 1e100 AS big_inf, -inf < 0 AS neg_inf
