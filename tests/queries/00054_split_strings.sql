SELECT splitByChar(',', 'a,b,c') AS s, splitByString('::', 'a::b::c') AS ss, alphaTokens('ab12cd34') AS at;
SELECT arrayStringConcat(['a','b','c'], '-') AS j, arrayStringConcat(splitByChar(' ', 'x y z')) AS rt;
