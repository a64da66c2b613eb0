"""Utilities: quality metrics, tracing, profiling helpers."""
