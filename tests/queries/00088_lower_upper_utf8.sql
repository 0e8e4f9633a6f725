SELECT lower('AbC') AS l, upper('aBc') AS u, lowerUTF8('ПрИвЕт') AS lu, upperUTF8('ПрИвЕт') AS uu
