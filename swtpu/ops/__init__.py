"""Scoring kernels: NumPy oracles, XLA kernels, Pallas kernels."""
