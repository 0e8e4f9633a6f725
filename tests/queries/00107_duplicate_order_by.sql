SELECT number AS n FROM (SELECT number FROM system.numbers LIMIT 5) ORDER BY n DESC, n, n DESC
