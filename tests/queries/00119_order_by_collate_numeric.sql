SELECT toString(number) AS s FROM (SELECT number FROM system.numbers LIMIT 12) ORDER BY s;
SELECT number FROM (SELECT number FROM system.numbers LIMIT 12) ORDER BY toString(number) DESC LIMIT 3
