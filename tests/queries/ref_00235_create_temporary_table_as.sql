create temporary table one as select 1;
select * from one;
