"""Engine operators — each a pure ``DataFrame -> DataFrame`` function."""
