SELECT appendTrailingCharIfAbsent('', 'a') AS a, appendTrailingCharIfAbsent('a', 'a') AS b, appendTrailingCharIfAbsent('a', 'b') AS c;
