"""Probe: are the independent-call timings honest? Compare
(a) independent perturbed calls (BENCH.md methodology) vs
(b) a serialized chain where call i+1's seed is call i's output —
the runtime cannot overlap or elide chained executions.
Reuses the exact jaxprs probe_sort.py compiled (cache hits).
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

from gaussian_splatting_tpu.utils.cache import enable_compile_cache

enable_compile_cache()

rng = np.random.default_rng(0)
REPS = 5

for M in (8 * 1024**2,):
    key_i = jnp.asarray(rng.integers(0, 1 << 29, size=(M,)), jnp.int32)
    pay = [jnp.asarray(rng.uniform(size=(M,)), jnp.float32) for _ in range(11)]

    f12 = jax.jit(lambda s, k, *ps: jax.lax.sort((k ^ s,) + ps, num_keys=1))

    # warm/compile
    out = f12(jnp.int32(12345), key_i, *pay)
    jax.block_until_ready(out)

    # (a) independent calls
    t0 = time.time()
    for i in range(REPS):
        out = f12(jnp.int32(i), key_i, *pay)
    jax.block_until_ready(out)
    dt_a = (time.time() - t0) / REPS

    # (b) chained: seed = previous sorted key's first element (device dep)
    s = jnp.int32(7)
    t0 = time.time()
    for i in range(REPS):
        out = f12(s, key_i, *pay)
        s = out[0][0] ^ jnp.int32(i)   # tiny host-free dependency
    jax.block_until_ready(out)
    dt_b = (time.time() - t0) / REPS

    print(f"M={M}: independent {dt_a*1e3:.2f} ms  chained {dt_b*1e3:.2f} ms",
          flush=True)
