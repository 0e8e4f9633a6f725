SELECT formatReadableSize(1) AS b1, formatReadableSize(1024) AS kib, formatReadableSize(1048576) AS mib, formatReadableSize(1536) AS frac
