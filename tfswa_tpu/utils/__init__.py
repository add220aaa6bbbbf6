"""Utilities: torch checkpoint conversion, profiling, logging."""
