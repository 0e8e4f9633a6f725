SELECT count() < 6000 AND count() > 0 FROM events SAMPLE 0.5;
