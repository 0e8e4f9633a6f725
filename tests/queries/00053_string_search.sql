SELECT position('Hello, world!', 'world') AS p, position('abc', 'z') AS p0, positionCaseInsensitive('ABC', 'b') AS pc;
SELECT like('abc', 'a%') AS l, notLike('abc', 'z%') AS nl, match('ab12', '[0-9]+') AS m, replaceAll('aaa', 'a', 'b') AS r, replaceOne('aaa', 'a', 'b') AS ro;
SELECT extract('key=val', '=(\\w+)') AS ex, extractAll('a1b2c3', '[0-9]') AS ea, startsWith('abc', 'ab') AS sw, endsWith('abc', 'bc') AS ew;
