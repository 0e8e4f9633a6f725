SELECT count() FROM (SELECT n_nationkey AS k FROM nation UNION ALL SELECT r_regionkey AS k FROM region) WHERE k IN (SELECT r_regionkey FROM region)
