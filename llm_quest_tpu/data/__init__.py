"""Data layer: numpy-based datasets, collators and a batching loader.

Framework-agnostic by design (plain numpy arrays out) — batches cross into
jax at the jitted step boundary. Mirrors the behavior of the reference's
torch Dataset/DataLoader stack (dataset.py) without torch.
"""
