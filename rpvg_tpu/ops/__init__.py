"""Pallas TPU kernels for the hot device ops."""
