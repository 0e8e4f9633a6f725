SELECT * FROM system.numbers LIMIT 10
