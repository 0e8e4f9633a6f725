SELECT 'abcdef' LIKE 'abc%' AS p1, 'abcdef' LIKE '%def' AS p2, 'abcdef' LIKE '%cd%' AS p3, 'abcdef' LIKE 'xyz%' AS p0;
SELECT match('hello123', '^hello[0-9]+$') AS m1, match('hello', '^hello[0-9]+$') AS m0
