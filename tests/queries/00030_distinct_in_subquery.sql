SELECT x FROM (SELECT DISTINCT 1 AS x, arrayJoin([1, 2]) AS y) ORDER BY x;
SELECT count() FROM (SELECT DISTINCT n_regionkey FROM nation);
