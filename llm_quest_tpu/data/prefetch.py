"""Host→device input pipeline: background-thread batch prefetch.

Training steps should never wait on PCIe/tunnel transfers: while the chip
runs step N, the host should already be copying batch N+1. The reference
leans on torch DataLoader workers for this (SURVEY §2.3); the JAX-native
equivalent is a small queue of batches ALREADY placed on device (or onto a
Mesh sharding), filled by a daemon thread.

Measured motivation: the ViT uint8 host-feed bench (scripts/
bench_vit_host_feed.py) shows 1.40× encode throughput from exactly this
double-buffering on the tunneled v5e — this module generalizes it to any
batch iterator.

jax.device_put is async (returns immediately, transfer proceeds in the
background), so one prefetch thread suffices: the queue holds in-flight
buffers without blocking the consumer until it actually USES the data.
"""

import queue
import threading

import jax


def prefetch_to_device(iterator, size=2, sharding=None):
    """Yield batches from ``iterator`` with transfers overlapped ahead.

    iterator: yields pytrees of host arrays (numpy/lists).
    size: in-flight batches (2 = classic double buffering; more only helps
        when batch production is bursty).
    sharding: optional placement —
        - None: default device,
        - a ``jax.sharding.Sharding``: every leaf placed onto it,
        - a callable ``batch -> shardings pytree`` (e.g. per-leaf
          ``batch_sharding(mesh, leaf.ndim)``) for DP/mesh training.

    The producer thread is a daemon and dies with the interpreter; an
    exception in the iterator (or transfer) re-raises at the consumer's
    next pull, not silently.
    """
    q = queue.Queue(maxsize=size)
    END = object()

    def produce():
        try:
            for batch in iterator:
                if sharding is None:
                    item = jax.device_put(batch)
                elif callable(sharding):
                    item = jax.device_put(batch, sharding(batch))
                else:
                    item = jax.tree.map(lambda x: jax.device_put(x, sharding), batch)
                q.put(item)
            q.put(END)
        except BaseException as e:  # noqa: BLE001 — re-raised at the consumer
            q.put(e)

    threading.Thread(target=produce, daemon=True).start()
    while True:
        item = q.get()
        if item is END:
            return
        if isinstance(item, BaseException):
            raise item
        yield item
