SELECT arr, count() AS c FROM (SELECT [n_regionkey, n_nationkey % 2] AS arr FROM nation) GROUP BY arr ORDER BY arr LIMIT 6;
