SELECT count() FROM (SELECT number FROM system.numbers LIMIT 10) WHERE number IN (toUInt8(3), toUInt16(5), toUInt32(7));
SELECT count() FROM (SELECT toInt32(number) AS n FROM system.numbers LIMIT 10) WHERE n IN (2, 4, 6)
