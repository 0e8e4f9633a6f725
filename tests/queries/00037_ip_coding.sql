SELECT IPv4StringToNum('') = 0 AS a, IPv4StringToNum('not an ip string') = 0 AS b, IPv4NumToString(toUInt32(0)) AS c;
SELECT IPv4NumToString(IPv4StringToNum('127.0.0.1')) AS rt, IPv4StringToNum('127.0.0.1') AS n;
SELECT IPv6NumToString(IPv6StringToNum('::ffff:127.0.0.1')) AS v6rt, IPv6NumToString(IPv6StringToNum('2001:db8:0:3:0:1ff:0:2e')) AS v6;
