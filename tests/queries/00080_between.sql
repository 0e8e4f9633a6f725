SELECT count() FROM (SELECT number FROM system.numbers LIMIT 100) WHERE number BETWEEN 10 AND 20;
SELECT number FROM system.numbers WHERE number BETWEEN 3 AND 6 LIMIT 10
