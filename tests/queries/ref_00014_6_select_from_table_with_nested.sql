SELECT s, nest.x, nest.y FROM nested_test ARRAY JOIN nest.x
