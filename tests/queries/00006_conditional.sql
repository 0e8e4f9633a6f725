SELECT if(1 = 1, 'yes', 'no'), multiIf(0, 'a', 1, 'b', 'c');
SELECT 5 > 3 ? 'big' : 'small';
SELECT transform(2, [1, 2, 3], ['one', 'two', 'three'], 'other');
