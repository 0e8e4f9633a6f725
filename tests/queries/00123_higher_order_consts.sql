SELECT arrayMap(x -> 123, [1, 2, 3]) AS m;
SELECT arrayFilter(x -> 0, [1, 2, 3]) AS f0;
SELECT arrayFilter(x -> 1, [1, 2, 3]) AS f1;
SELECT arrayCount(x -> 1, [1, 2, 3]) AS c;
SELECT arrayExists(x -> 1, [1, 2, 3]) AS e;
SELECT arrayAll(x -> 0, [1, 2, 3]) AS al;
SELECT arraySum(x -> 2, [1, 2, 3]) AS s;
SELECT arrayFirst(x -> x > 1, [1, 2, 3]) AS fst;
SELECT arrayFirstIndex(x -> x > 1, [1, 2, 3]) AS fi;
SELECT arrayFirstIndex(x -> x > 9, [1, 2, 3]) AS fi0
