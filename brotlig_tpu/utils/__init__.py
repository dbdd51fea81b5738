"""Shared utilities (timing, profiling, logging)."""
