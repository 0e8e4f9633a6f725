SELECT [1, 2, 3][2], [1, 2, 3][-1], has([1, 2], 2), indexOf([10, 20, 30], 20);
SELECT arraySum([1, 2, 3]), arrayUniq([1, 1, 2]), range(4);
SELECT arrayStringConcat(['a', 'b', 'c'], '-'), splitByChar(',', 'x,y,z');
