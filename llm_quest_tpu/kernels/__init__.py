"""Pallas TPU kernels: the native performance tier for hot inner ops.

The reference has no native components (SURVEY §2.0) — these kernels are the
TPU build's equivalent of a CUDA kernel library: flash attention for the
training/prefill path, chunked GatedDeltaNet for the linear-attention
models. XLA versions in ops/ remain the correctness oracles and the
small-shape/decode paths.
"""
