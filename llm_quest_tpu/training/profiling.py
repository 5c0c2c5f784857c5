"""Profiling & throughput instrumentation.

Reference behavior (SURVEY §5.1): torch.profiler wrapper with tensorboard
trace handler (engine.py:499-640) and a timed loop printing interval +
cumulative tok/s and memory GB (engine.py:270-374). TPU equivalents:
jax.profiler traces (XPlane, viewable in TensorBoard/Perfetto) and a
ThroughputMeter reading device memory stats.
"""

import contextlib
import time

import jax


@contextlib.contextmanager
def profile_trace(logdir, *, with_memory=True):
    """jax.profiler trace context → TensorBoard-readable XPlane dump
    (TPU counterpart of engine.py:499-640)."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class ScheduledProfiler:
    """Step-scheduled trace capture — the TPU counterpart of the reference's
    torch.profiler schedule (engine.py:499-640: wait/warmup/active/repeat
    with a tensorboard trace handler).

    Call ``step()`` once per training step. Each cycle runs
    ``wait`` untraced steps, then ``warmup`` untraced steps (their purpose —
    excluding compile and cache-warm iterations from the capture — is served
    by not tracing them: XLA compiles on first call, and jax.profiler has no
    collect-and-discard mode), then traces exactly ``active`` steps into
    ``logdir/cycle_<k>`` (XPlane, TensorBoard/Perfetto-readable, includes
    device memory + per-op breakdown — record_shapes/profile_memory are
    always-on in XPlane). Repeats ``repeat`` times then goes inert
    (repeat=0 → repeat forever). Use as a context manager (or call
    ``close()``) so an in-flight trace is finalized on early exit.
    """

    def __init__(self, logdir, *, wait=2, warmup=2, active=3, repeat=1):
        assert active >= 1, "active window must trace at least one step"
        self.logdir = str(logdir)
        self.wait, self.warmup, self.active, self.repeat = wait, warmup, active, repeat
        self._i = 0
        self._cycle = 0
        self._tracing = False

    @property
    def cycle_len(self):
        return self.wait + self.warmup + self.active

    def step(self):
        """Advance one step; returns True while the profiler is tracing."""
        if self.repeat and self._cycle >= self.repeat:
            return False
        pos = self._i
        self._i += 1
        if pos == self.wait + self.warmup and not self._tracing:
            jax.profiler.start_trace(f"{self.logdir}/cycle_{self._cycle}")
            self._tracing = True
        if pos == self.cycle_len - 1:
            if self._tracing:
                jax.profiler.stop_trace()
                self._tracing = False
            self._i = 0
            self._cycle += 1
            return True  # this step was the last traced one
        return self._tracing

    def close(self):
        if self._tracing:
            jax.profiler.stop_trace()
            self._tracing = False

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()


def device_memory_gb(device=None):
    """(allocated_gb, limit_gb) from PJRT memory stats (engine.py:358-372
    counterpart); (0, 0) when the backend doesn't expose stats."""
    device = device or jax.devices()[0]
    stats = getattr(device, "memory_stats", lambda: None)()
    if not stats:
        return 0.0, 0.0
    return stats.get("bytes_in_use", 0) / 1e9, stats.get("bytes_limit", 0) / 1e9


class ThroughputMeter:
    """Interval + cumulative tokens/sec tracking (engine.py:270-374).

    Pass ``flops_per_token`` (e.g. from training.flops.text_train_flops_per
    _token) to get an ``mfu`` field next to every tok/s — the TPU-native
    completion of the reference's raw-tok/s instrumentation."""

    def __init__(self, flops_per_token=None):
        self.t0 = time.perf_counter()
        self.t_last = self.t0
        self.tokens_total = 0
        self.tokens_interval = 0
        self.flops_per_token = flops_per_token

    def update(self, num_tokens):
        self.tokens_total += num_tokens
        self.tokens_interval += num_tokens

    def report(self):
        """Returns dict with interval/cumulative tok/s + memory (+ mfu when
        flops_per_token was given); resets the interval window."""
        now = time.perf_counter()
        interval = self.tokens_interval / max(now - self.t_last, 1e-9)
        cumulative = self.tokens_total / max(now - self.t0, 1e-9)
        self.t_last = now
        self.tokens_interval = 0
        alloc, limit = device_memory_gb()
        out = {
            "tok_s_interval": interval,
            "tok_s_cumulative": cumulative,
            "mem_gb_allocated": alloc,
            "mem_gb_limit": limit,
        }
        if self.flops_per_token is not None:
            from llm_quest_tpu.training.flops import mfu

            out["mfu_interval"] = mfu(interval, self.flops_per_token)
            out["mfu_cumulative"] = mfu(cumulative, self.flops_per_token)
        return out


@contextlib.contextmanager
def debug_checks(*, nans=True, infs=False, disable_jit=False):
    """Numerics-debug mode — the TPU analogue of the reference's (absent)
    sanitizer tier (SURVEY §5.2: under XLA the failure modes are silent NaN
    propagation and donated-buffer aliasing, not data races).

    Inside the context:
    - ``jax_debug_nans`` / ``jax_debug_infs``: any op producing NaN/Inf
      raises immediately with the offending primitive (re-runs the op
      un-jitted to localize it);
    - ``disable_jit=True`` additionally runs everything op-by-op for
      printf-style debugging (orders of magnitude slower — small inputs only).

    Donated-buffer hygiene needs no runtime flag: XLA already errors on reuse
    of a donated argument, and the sharded train steps donate params/opt_state
    explicitly (parallel/sharding.py).
    """
    ctxs = []
    if nans:
        ctxs.append(("jax_debug_nans", True))
    if infs:
        ctxs.append(("jax_debug_infs", True))
    if disable_jit:
        ctxs.append(("jax_disable_jit", True))
    olds = [(name, getattr(jax.config, name)) for name, _ in ctxs]
    try:
        for name, val in ctxs:
            jax.config.update(name, val)
        yield
    finally:
        for name, old in olds:
            jax.config.update(name, old)
