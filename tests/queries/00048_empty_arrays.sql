SELECT empty([]) AS a, notEmpty([1]) AS b, empty('') AS c, notEmpty('x') AS d, length([1,2,3]) AS e;
SELECT emptyArrayInt32() AS i32, emptyArrayString() AS s, range(3) AS r;
