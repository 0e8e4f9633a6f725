SELECT round(1.2345, 1 + 1) AS r, ceil(1.234, 2) AS c, floor(1.987, number) AS f FROM (SELECT 1 AS number);
SELECT truncate(-1.9) AS t0, truncate(1.987, 1) AS t1
