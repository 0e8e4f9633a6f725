SELECT quantileExact(0.5)(number) AS med, quantileExact(0.9)(number) AS p90, median(number) AS m FROM (SELECT number FROM system.numbers LIMIT 101);
SELECT quantilesExact(0.25, 0.5, 0.75)(number) AS qs FROM (SELECT number FROM system.numbers LIMIT 101);
