SELECT number FROM system.numbers LIMIT 10;
SELECT number * number AS sq FROM system.numbers LIMIT 5;
