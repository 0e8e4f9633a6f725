SELECT lengthUTF8('привет') AS l, upperUTF8('abc') AS u, lowerUTF8('ABC') AS lo, reverseUTF8('abc') AS r;
SELECT positionUTF8('привет мир', 'мир') AS p, substringUTF8('привет', 1, 3) AS s;
