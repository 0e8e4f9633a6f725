SELECT multiIf(number < 2, 'low', number < 4, 'mid', 'high') AS band, count() AS c FROM (SELECT number FROM system.numbers LIMIT 6) GROUP BY band ORDER BY band
