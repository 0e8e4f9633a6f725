SELECT if(number % 2 = 0, ['a', 'b'], ['c']) AS sa, arrayStringConcat(if(number % 2 = 0, ['a', 'b'], ['c']), '+') AS joined FROM system.numbers LIMIT 4
