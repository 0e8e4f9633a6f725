SELECT groupArray(n_regionkey) AS g FROM (SELECT n_regionkey FROM nation ORDER BY n_nationkey LIMIT 5);
SELECT groupUniqArray(n_regionkey) AS g FROM (SELECT n_regionkey FROM nation ORDER BY n_nationkey LIMIT 5);
SELECT arraySum(groupArray(n_nationkey)) AS s FROM nation;
