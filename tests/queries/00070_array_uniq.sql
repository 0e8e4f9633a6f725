SELECT arrayUniq([1, 2, 2, 3, 3, 3]) AS u, arrayUniq(emptyArrayUInt8()) AS ue, arrayUniq(['a', 'a', 'b']) AS us
