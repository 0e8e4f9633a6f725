SELECT least(1, 2) AS l1, greatest(1, 2) AS g1, least(-1.5, 2.5) AS lf, greatest('abc', 'abd') AS gs;
SELECT least(number, 5) AS capped FROM system.numbers LIMIT 8
