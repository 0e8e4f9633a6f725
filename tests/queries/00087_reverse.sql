SELECT reverse('abcd') AS rs, reverse('') AS re, arrayReverse([1, 2, 3]) AS ra;
SELECT reverse(toString(number * 12)) AS r FROM system.numbers LIMIT 3
