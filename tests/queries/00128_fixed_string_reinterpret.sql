SELECT hex(toFixedString('ab', 4)) AS h;
SELECT reinterpretAsString(4702111234474983745) AS s;
SELECT length(toFixedString('abc', 8)) AS l
