SELECT uniqExact(n_regionkey) AS ue, uniq(n_regionkey) AS u, uniqCombined(n_regionkey) AS uc, uniqUpTo(10)(n_regionkey) AS uu FROM nation;
