SELECT 'a\tb' AS tab, 'a\nb' LIKE 'a%b' AS nl_like, length('a\x41b') AS hexlen, 'a\x41b' AS hexstr
