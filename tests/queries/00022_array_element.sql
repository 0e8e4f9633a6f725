SELECT [11,12,13][2] AS a, [11,12][3] AS b, [11,12,13][-1] AS c, [11,12][-2] AS d, [11][0] AS e;
SELECT ['Abc','Df','Q'][2] AS a, ['Abc','DEFQ'][-1] AS b, ['A'][0] AS c, arrayElement(['x','y'], 4) AS d;
SELECT number AS id, [1,2,3][id] AS v FROM system.numbers LIMIT 5;
