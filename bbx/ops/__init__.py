"""Pallas TPU kernels for the hot ops (with pure-XLA fallbacks)."""
