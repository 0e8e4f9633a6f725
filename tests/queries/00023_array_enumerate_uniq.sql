SELECT arrayEnumerateUniq([10,20,10,30,10]) AS u;
SELECT arrayEnumerateUniq(groupArray(n_regionkey)) AS u FROM (SELECT n_regionkey FROM nation ORDER BY n_nationkey LIMIT 8);
