"""Inference layer: statistical estimators over read x path likelihood
matrices (JAX device kernels + host orchestration)."""
