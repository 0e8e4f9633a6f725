SELECT groupArray(toString(number)) AS ga FROM (SELECT number FROM system.numbers LIMIT 5);
SELECT k, groupArray(number) AS ga FROM (SELECT number % 2 AS k, number FROM system.numbers LIMIT 6) GROUP BY k ORDER BY k
