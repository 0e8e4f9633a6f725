SELECT position('Hello, world', 'o') AS p1, position('Hello, world', 'world') AS p2, position('Hello', 'x') AS p0, positionCaseInsensitive('Hello', 'HELLO') AS pci
