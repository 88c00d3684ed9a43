"""Round-4 sort-shape probes: what would a bucket-partitioned binning sort
actually pay per entry, across bucket counts?

XLA's flat 12-operand sort at 4.7M is ~54 ms (~11 ns/entry). r3 measured
(8, 590k) batched = 38 ms — barely better. If MANY small rows amortize
(e.g. (64, 74k) or (256, 18.5k)), a fast Pallas partition into B buckets
plus ONE batched sort is the structural lever; if batched cost stays flat,
XLA sort cost is row-length-insensitive at these sizes and the flat sort
stays.

Also re-probes the sliced gradient reduce at K in {4, 8} at the r4
grad-buffer size, and the 1-key packed (tile<<16 | qdepth) sort vs the
2-key exact sort at the real slot distribution.

Run: python scratch/probe_sort_shapes_r4.py
"""

import sys

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from gaussian_splatting_tpu.utils.cache import enable_compile_cache

enable_compile_cache()

from gaussian_splatting_tpu.utils.profiling import time_fn_device

print(f"backend: {jax.default_backend()}", flush=True)

M = 4_718_592  # 4.5M = the bench's n_sort_slots (pow2-squeezed)
rng = np.random.default_rng(1)


def batched_sort_probe():
    for B in (1, 8, 64, 256, 1024):
        rows = M // B
        key = jnp.asarray(rng.integers(0, 8160 * 65536, size=(B, rows)),
                          jnp.int32)
        pays = [jnp.asarray(rng.uniform(size=(B, rows)), jnp.float32)
                for _ in range(11)]

        def fn(s, k, *ps):
            ops = jax.lax.sort((k,) + tuple(p * s for p in ps), num_keys=1,
                               dimension=1)
            return [o[..., :: 4097] for o in ops]

        dt = time_fn_device(fn, (key,) + tuple(pays), reps=5)
        print(f"[5] batched 1key+11pay sort ({B:5d}, {rows:8d}): "
              f"{dt * 1e3:7.2f} ms  ({dt / M * 1e9:.2f} ns/entry)",
              flush=True)


batched_sort_probe()


def unrolled_sort_probe():
    """K separate sorts of M/K (the sliced-reduce trick applied to binning
    cost scaling): how superlinear is the flat sort here?"""
    for K in (2, 4, 8):
        rows = M // K
        keys = [jnp.asarray(rng.integers(0, 8160 * 65536, size=(rows,)),
                            jnp.int32) for _ in range(K)]
        pays = [jnp.asarray(rng.uniform(size=(rows,)), jnp.float32)
                for _ in range(11)]

        def fn(s, *args):
            ks = args[:K]
            ps = args[K:]
            outs = []
            for i in range(K):
                ops = jax.lax.sort((ks[i],) + tuple(p * s for p in ps),
                                   num_keys=1)
                outs.append([o[::4097] for o in ops])
            return outs

        dt = time_fn_device(fn, tuple(keys) + tuple(pays), reps=5)
        print(f"[6] {K} unrolled 1key+11pay sorts of {rows}: "
              f"{dt * 1e3:7.2f} ms", flush=True)


unrolled_sort_probe()
