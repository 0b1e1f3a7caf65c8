"""Index-build side of the engine: posting-list construction, stats,
compression codec, and the salted term-partitioned merge."""
