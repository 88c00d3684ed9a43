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
    """DEPRECATED for benchmarking — independent perturbed calls can be
    overlapped across the remote execution pool and memoized across
    processes (measured: a 12-operand 8.4M ``lax.sort`` reads 0.35 ms this
    way vs 265 ms serialized). Kept only for quick smoke timing; all real
    numbers use ``time_fn_chained``."""
    import jax

    out = fn(seeds[-1])
    jax.block_until_ready(out)
    t0 = time.time()
    for i in range(reps):
        out = fn(seeds[i % (len(seeds) - 1)])
    jax.block_until_ready(out)
    return (time.time() - t0) / reps


def time_fn_device(fn: Callable, args: Sequence = (), reps: int = 10,
                   warm: bool = True) -> float:
    """The honest timing harness: run ``fn(seed, *args)`` ``reps`` times
    inside ONE jitted on-device fori_loop whose carry threads a scalar from
    each iteration's output into the next iteration's seed. One remote
    execution total, so the remote layer can neither overlap reps across its
    worker pool nor memoize them, and the per-call RTT (~55 ms measured on
    this tunnel) is paid once, not per rep.

    ``fn`` must make the f32 scalar seed reach every expensive computation.
    Arrays must be passed via ``args`` (NOT closed over — closures embed
    device arrays as HLO constants, bloating compiles and remote requests).
    Every output leaf is summed into the carry so XLA cannot dead-code any
    output's computation. Returns seconds/rep: (t(reps) - t(1)) / (reps-1),
    which also cancels the one-off RTT and the carry-sum epilogue."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    assert reps >= 2

    @jax.jit
    def run(n, seed, *a):
        def body(i, carry):
            s = seed + carry * 1e-30 + jnp.float32(i) * 1e-9
            out = fn(s, *a)
            v = jnp.float32(0.0)
            for leaf in jax.tree_util.tree_leaves(out):
                # Position-DEPENDENT reduction (strided subset): a plain sum
                # is permutation-invariant, which lets XLA elide sorts
                # entirely (reduce(sort(x)) -> reduce(x)).
                lv = jnp.sum(jnp.ravel(leaf)[::4097]).astype(jnp.float32)
                v = v + jnp.where(jnp.isfinite(lv), lv, 0.0)
            return v
        return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))

    seed = np.float32(np.random.default_rng().uniform(1.0, 1.0 + 1e-5))

    def once(n):
        t0 = time.time()
        # Read the VALUE, not just block_until_ready: on the remote-TPU
        # platform block_until_ready can return without forcing execution
        # (lazy futures); only a device->host value read is a true sync.
        float(run(n, seed, *args))
        return time.time() - t0

    if warm:
        once(1)
    t1 = once(1)
    tr = once(reps)
    return max(tr - t1, 1e-9) / (reps - 1)


def time_fn_chained(fn: Callable, reps: int = 5, seed0: float = None) -> float:
    """Serialization-enforcing timing: call ``i+1``'s input scalar is derived
    (through a host sync) from call ``i``'s output, so the remote execution
    layer can neither overlap the reps across its worker pool nor serve them
    from its content-addressed memoizer (each seed value is fresh per
    process AND data-dependent on the previous call). ``fn(seed)`` must make
    the f32 scalar ``seed`` reach every expensive computation.

    Per-rep overhead = one scalar device->host readback; calibrate with a
    null fn and subtract if it matters. Returns seconds/call."""
    import numpy as np
    import jax
    import jax.numpy as jnp

    if seed0 is None:
        seed0 = float(np.random.default_rng().uniform(1.0, 1.0 + 1e-4))

    def readback(out):
        leaf = jax.tree_util.tree_leaves(out)[0]
        v = float(jnp.ravel(leaf)[0])
        return v if np.isfinite(v) else 0.0

    s = seed0
    v = readback(fn(jnp.float32(s)))  # compile + warm
    s = seed0 + 1e-9 + 1e-30 * v
    t0 = time.time()
    for i in range(reps):
        v = readback(fn(jnp.float32(s)))
        s = seed0 + 1e-9 * (i + 2) + 1e-30 * v
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
