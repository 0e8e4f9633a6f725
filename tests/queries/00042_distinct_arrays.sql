SELECT DISTINCT emptyArrayString() AS k FROM (SELECT number FROM system.numbers LIMIT 100);
SELECT DISTINCT arrayFilter(x -> notEmpty(x), arrayJoin([[''], ['is_registred'], ['registration_month','user_login','is_registred'], ['is_registred'], ['']])) AS a ORDER BY a;
