"""Pallas TPU kernels for the hot ops (hash-grid encoding, fused field eval)."""
