SELECT domain('https://www.example.com/path?q=1#frag') AS d, domainWithoutWWW('https://www.example.com/path') AS dw, protocol('https://example.com') AS pr;
SELECT path('https://example.com/a/b?q=1') AS p, queryString('https://example.com/a?q=1&r=2') AS qs, fragment('https://example.com/a#sec') AS fr, extractURLParameter('https://e.com/?a=1&b=2', 'b') AS b;
