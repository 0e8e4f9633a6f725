SELECT ['Hello', 'Goodbye']
