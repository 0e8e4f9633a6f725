SELECT replaceRegexpOne('abcabc', 'b', 'X') AS one, replaceRegexpAll('abcabc', 'b', 'X') AS all;
SELECT replaceRegexpOne('hello world', '(w\\w+)', '[\\1]') AS backref
