SELECT toYear(toDate('1997-07-13')), toMonth(toDate('1997-07-13')), toDayOfMonth(toDate('1997-07-13'));
SELECT toDayOfWeek(toDate('1997-07-13')), toMonday(toDate('1997-07-13')), toStartOfMonth(toDate('1997-07-13'));
SELECT toRelativeDayNum(toDate('1970-01-11')), toUnixTimestamp(toDateTime('1970-01-02 00:00:00'));
