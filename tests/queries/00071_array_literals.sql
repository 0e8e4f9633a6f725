SELECT [1, 2, 3] AS a, ['a', 'b'] AS s, [[1], [2, 3]] AS nested, length([1, 2, 3, 4]) AS l
