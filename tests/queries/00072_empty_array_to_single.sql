SELECT emptyArrayToSingle([1, 2]) AS a, emptyArrayToSingle(emptyArrayUInt8()) AS b, emptyArrayToSingle(emptyArrayString()) AS c
