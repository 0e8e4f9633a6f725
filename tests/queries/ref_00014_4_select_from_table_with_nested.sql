SELECT * FROM nested_test
