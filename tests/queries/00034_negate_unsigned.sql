SELECT -toUInt32(1) AS x, -toUInt8(255) AS y, negate(toUInt16(7)) AS z;
