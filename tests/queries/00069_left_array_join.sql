SELECT k, e FROM (SELECT number AS k, arrayFilter(x -> x < number, range(3)) AS a FROM system.numbers LIMIT 3) LEFT ARRAY JOIN a AS e ORDER BY k, e
