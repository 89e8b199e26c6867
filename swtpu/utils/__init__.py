"""Batching, segment packing, metrics, compile cache."""
