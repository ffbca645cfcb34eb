"""Sources: CDC record readers (batch + stream) and test fixtures."""
