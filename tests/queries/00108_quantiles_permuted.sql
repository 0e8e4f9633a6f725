SELECT quantilesExact(0.9, 0.1, 0.5)(number) AS q FROM (SELECT number FROM system.numbers LIMIT 101);
SELECT quantileExact(0.5)(number) AS med, quantileExact(0.25)(number) AS lo FROM (SELECT number FROM system.numbers LIMIT 101)
