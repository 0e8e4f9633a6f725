SELECT * FROM alter_test;

DROP TABLE alter_test;
