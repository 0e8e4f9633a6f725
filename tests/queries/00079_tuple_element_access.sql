SELECT t.1 AS first, t.2 AS second FROM (SELECT tuple(number, toString(number * 2)) AS t FROM system.numbers LIMIT 3) ORDER BY first
