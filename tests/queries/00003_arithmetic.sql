SELECT 2 + 3 * 4, intDiv(7, 2), modulo(7, 3), 2 + 3 = 5;
SELECT intDivOrZero(5, 0), abs(-3), least(4, 2), greatest(4, 2);
SELECT bitAnd(12, 10), bitOr(12, 10), bitXor(12, 10), bitShiftLeft(1, 4);
