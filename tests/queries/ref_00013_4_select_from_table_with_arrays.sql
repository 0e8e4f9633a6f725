SELECT * FROM arrays_test
