SELECT concat(toString(n_regionkey), '_', toString(n_nationkey % 2)) AS k, count() AS c FROM nation GROUP BY k ORDER BY k
