SELECT toDateTime('2017-03-05 10:20:30') AS dt, toDate(toDateTime('2017-03-05 10:20:30')) AS d, toHour(toDateTime('2017-03-05 10:20:30')) AS h, toMinute(toDateTime('2017-03-05 10:20:30')) AS m
