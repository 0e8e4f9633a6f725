SELECT concat('foo', 'bar'), upper('mixed'), lower('MIXED'), reverse('abc');
SELECT substring('clickhouse', 6, 5), position('hello world', 'world'), length('abcde');
SELECT like('hello', 'he%'), match('abc123', '[0-9]+'), extract('v=42;', '[0-9]+');
SELECT replaceAll('a-b-c', '-', '+'), empty(''), notEmpty('x');
