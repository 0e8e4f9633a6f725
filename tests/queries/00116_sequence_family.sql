SELECT sequenceMatch('(?1)(?2)')(toDateTime(t), e = 'a', e = 'b') AS m FROM (SELECT 1000 + number * 10 AS t, if(number % 2 = 0, 'a', 'b') AS e FROM system.numbers LIMIT 6);
SELECT sequenceCount('(?1)(?2)')(toDateTime(t), e = 'a', e = 'b') AS c FROM (SELECT 1000 + number * 10 AS t, if(number % 2 = 0, 'a', 'b') AS e FROM system.numbers LIMIT 6)
