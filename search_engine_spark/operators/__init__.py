"""Engine operators: index build, codec, search, dedup, ANN, incremental."""
