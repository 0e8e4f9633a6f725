SELECT s, arr FROM arrays_test ARRAY JOIN arr
