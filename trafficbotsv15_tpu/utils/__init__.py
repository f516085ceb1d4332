"""Utilities: logging, profiling."""
