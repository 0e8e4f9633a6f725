SELECT number % 2 = 0 ? 'even' : 'odd' AS parity, number % 3 = 0 ? number : 0 AS fizz FROM system.numbers LIMIT 6
