SELECT k, va, wb FROM (SELECT number AS k, number * 10 AS va FROM system.numbers LIMIT 4) ALL FULL JOIN (SELECT number + 2 AS k, number AS wb FROM system.numbers LIMIT 4) USING k ORDER BY k;
SELECT k, va, wb FROM (SELECT number AS k, number * 10 AS va FROM system.numbers LIMIT 4) ALL RIGHT JOIN (SELECT number + 2 AS k, number AS wb FROM system.numbers LIMIT 4) USING k ORDER BY k
