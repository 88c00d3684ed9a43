"""Profiling helpers — the TPU counterpart of the reference's NVTX ranges and
W&B wallclock stats (``gaussian_rasterizer.py:120``, ``trainer.py:873-876``):
``jax.profiler`` trace capture plus a cache-busting timing harness (the
remote-TPU execution layer memoizes pure executions on identical inputs, so
naive timing loops report ~0)."""

from __future__ import annotations

import contextlib
import time
from typing import Callable, Sequence


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a jax.profiler trace viewable in TensorBoard/Perfetto."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named trace span (NVTX-range analog)."""
    import jax

    return jax.profiler.TraceAnnotation(name)


def time_fn(fn: Callable, seeds: Sequence, reps: int = 5) -> float:
    """Median-free simple timing with per-call input perturbation: ``fn`` is
    called as fn(seed) and must make the seed reach every expensive
    computation (defeats execution memoization). Returns seconds/call."""
    import jax

    out = fn(seeds[-1])
    jax.block_until_ready(out)
    t0 = time.time()
    for i in range(reps):
        out = fn(seeds[i % (len(seeds) - 1)])
    jax.block_until_ready(out)
    return (time.time() - t0) / reps


def flops_accounting(n_isect: int, n_pixels: int, tile_pixels: int = 256) -> dict:
    """Roofline accounting for one fwd+bwd rasterization (see bench.py):
    VPU pair-ops dominate; returns the op counts used for the
    fraction-of-roofline metric."""
    pairs = n_isect * tile_pixels
    return {
        "pair_ops_fwd": 30 * pairs,
        "pair_ops_bwd": 60 * pairs,
        "hbm_bytes_soa": n_isect * 64,
        "pairs": pairs,
    }
