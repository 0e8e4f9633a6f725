SELECT 'a\tb\nc\td' AS x FORMAT Vertical;
SELECT 'a\tb\nc\td' AS x FORMAT VerticalRaw;
