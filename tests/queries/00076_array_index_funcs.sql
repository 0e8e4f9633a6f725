SELECT has([1, 2, 3], 2) AS h1, has([1, 2, 3], 5) AS h0, indexOf(['a', 'b', 'c'], 'b') AS i, countEqual([1, 2, 2, 2, 3], 2) AS ce
