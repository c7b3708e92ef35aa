"""IO parsers, math helpers, timers, synthetic data."""
