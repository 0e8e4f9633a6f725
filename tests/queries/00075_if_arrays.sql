SELECT number, if(number % 2 = 0, [1, 2], [3]) AS arr, if(number % 2 = 0, ['even'], ['odd', 'x']) AS sarr FROM system.numbers LIMIT 4
