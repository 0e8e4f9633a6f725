SELECT arrayMap(x -> x * 2, [1, 2, 3]), arrayFilter(x -> x % 2 = 0, range(10));
SELECT arrayExists(x -> x > 2, [1, 2, 3]), arrayAll(x -> x > 0, [1, 2, 3]), arrayFirst(x -> x > 1, [1, 2, 3]);
SELECT arraySort([3, 1, 2]), arrayReverseSort([3, 1, 2]), arrayCount(x -> x > 1, [1, 2, 3]);
