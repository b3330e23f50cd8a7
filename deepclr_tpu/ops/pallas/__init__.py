"""Pallas TPU kernels for the point-op hot path."""
