"""Utilities: audio I/O, checkpoint conversion, compile cache, profiling."""
