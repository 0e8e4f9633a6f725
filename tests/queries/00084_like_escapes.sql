SELECT 'a_c' LIKE 'a\_c' AS esc_match, 'abc' LIKE 'a\_c' AS esc_miss, '50%' LIKE '50\%' AS pct, 'a{1}' LIKE 'a{1}' AS curly
