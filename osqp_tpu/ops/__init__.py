"""Pallas TPU kernels for the hot paths (populated as profiling demands)."""
