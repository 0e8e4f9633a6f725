SELECT arrayStringConcat(['a', 'b', 'c']) AS j0, arrayStringConcat(['x', 'y'], '-') AS j1, arrayStringConcat(emptyArrayString(), ',') AS je;
SELECT arrayStringConcat(arrayMap(x -> toString(x), range(5)), ',') AS nums
