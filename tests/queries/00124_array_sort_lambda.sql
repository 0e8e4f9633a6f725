SELECT arraySort(x -> -x, [1, 3, 2]) AS d;
SELECT arrayReverseSort(x -> x, [1, 3, 2]) AS r;
SELECT arraySort([3, 1, 2]) AS plain
