WITH 10 AS ten SELECT ten, ten * ten;
