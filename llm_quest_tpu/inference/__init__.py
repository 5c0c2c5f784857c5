"""Inference stack: static-shape caches, scan decode loops, samplers,
speculative decoding."""
