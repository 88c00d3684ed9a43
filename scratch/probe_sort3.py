"""Is lax.sort cost linear in M or pow2-stepped? (Round-1 'pow2' finding
used the broken independent-call methodology.)"""

import jax
import jax.numpy as jnp
import numpy as np

from gaussian_splatting_tpu.utils.cache import enable_compile_cache
from gaussian_splatting_tpu.utils.profiling import time_fn_device

enable_compile_cache()
rng = np.random.default_rng(0)

for M in (2_100_000, 4_190_000, 4_200_000, 6_170_000, 8_388_608):
    key = jnp.asarray(rng.integers(0, 1 << 29, size=(M,)), jnp.int32)
    pays = tuple(jnp.asarray(rng.uniform(size=(M,)), jnp.float32)
                 for _ in range(11))
    dt = time_fn_device(
        lambda s, k, *p: jax.lax.sort(
            (k ^ (s * 7919.0).astype(jnp.int32),) + p, num_keys=1),
        (key,) + pays, reps=6)
    print(f"M={M}: 1key+11pay {dt*1e3:.1f} ms ({dt/M*1e9:.2f} ns/entry)",
          flush=True)
