SELECT visitParamHas('{"a":1,"b":"x"}', 'a') AS h, visitParamExtractInt('{"a":42}', 'a') AS i, visitParamExtractString('{"s":"hello"}', 's') AS s, visitParamExtractBool('{"t":true}', 't') AS t;
