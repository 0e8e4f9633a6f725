select a from (select (1, 2) as a) any inner join (select (1, 2) as a) using a;
