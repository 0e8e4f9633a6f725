SELECT sum(x) FROM (SELECT arrayJoin(range(1000)) AS x FROM system.numbers LIMIT 10);
SELECT count() FROM (SELECT arrayJoin(arrayMap(i -> i * 2, range(100))) AS v FROM system.numbers LIMIT 5) WHERE v >= 100
