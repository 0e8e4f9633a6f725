SELECT uniqExact(number % 3, number % 2) AS u2, uniqExact(number % 5) AS u1 FROM (SELECT number FROM system.numbers LIMIT 30);
SELECT uniqExact(n_regionkey, n_nationkey % 3) AS u FROM nation
