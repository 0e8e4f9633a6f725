SELECT arrayReduce('sum', [1, 2, 3, 4]) AS s, arrayReduce('max', [5, 1, 9]) AS m, arrayReduce('uniq', [1, 1, 2, 2, 3]) AS u, arrayReduce('avg', [2, 4, 6]) AS a
