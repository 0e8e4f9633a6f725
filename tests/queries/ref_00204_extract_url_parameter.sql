SELECT extractURLParameter('http://test.com/?testq=aaa&q=111', 'q');
