SELECT toDateTime('1970-01-02 00:00:00') + 1 AS a, toDateTime('1970-01-02 00:00:00') - 1 AS b;
SELECT yesterday() + 1 = today() AS a, today() - 1 = yesterday() AS b, today() = toDate(now()) AS c;
SELECT toDate('2024-03-01') - toDate('2024-02-01') AS diff, toDate('2024-02-28') + 2 AS leap;
