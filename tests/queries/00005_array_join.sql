SELECT arrayJoin([3, 1, 2]) AS x ORDER BY x;
