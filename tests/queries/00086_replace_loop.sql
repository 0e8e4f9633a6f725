SELECT replaceOne('aaa', 'a', 'b') AS r1, replaceAll('aaa', 'a', 'b') AS ra, replaceAll('abcabc', 'bc', 'X') AS rx, replaceRegexpAll('a1b22c333', '[0-9]+', '#') AS rr;
SELECT replaceAll(s, 'o', '0') AS masked FROM (SELECT 'foo bar boo' AS s)
