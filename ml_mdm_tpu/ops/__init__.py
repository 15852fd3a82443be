"""Pallas TPU kernels and their XLA fallbacks."""
