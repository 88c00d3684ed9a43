"""Round-3 probe: do UNROLLED per-slice sorts beat the flat sort?

The reduce doesn't need a global sort: slice the gradient stream into K
static contiguous segments, sort each by gid separately (small sorts run
at the fast <=1M rate if the round-2 claim holds), segsum each, add the
(16, N) outputs. No partition kernel at all.

Run: python scratch/probe_slice_sort.py
"""

import sys

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from gaussian_splatting_tpu.utils.cache import enable_compile_cache
from gaussian_splatting_tpu.utils.profiling import time_fn_device

enable_compile_cache()
rng = np.random.default_rng(0)

M = 4_718_592
NOPS = 10  # reduce shape: gid key + 9 payloads

key = jnp.asarray(rng.integers(0, 1_000_000, size=(M,)), jnp.float32)
pays = tuple(jnp.asarray(rng.uniform(size=(M,)), jnp.float32)
             for _ in range(NOPS - 1))


def seeded(s, k):
    return k + (s - 1.0) * 1e-9


print("== flat 10-op sort ==", flush=True)
dt = time_fn_device(
    lambda s, k, *p: jax.lax.sort((seeded(s, k),) + p, num_keys=1),
    (key,) + pays, reps=6)
print(f"flat M={M}: {dt*1e3:6.1f} ms ({dt/M*1e9:.2f} ns/entry)", flush=True)

for K in (2, 4, 8, 16):
    m = M // K

    def unrolled(s, k, *p, K=K, m=m):
        outs = []
        for i in range(K):
            sl = lambda a: jax.lax.dynamic_slice_in_dim(a, i * m, m)
            outs.append(jax.lax.sort((seeded(s, sl(k)),) + tuple(
                sl(q) for q in p), num_keys=1))
        return outs

    dt = time_fn_device(unrolled, (key,) + pays, reps=6)
    print(f"unrolled K={K} m={m}: {dt*1e3:6.1f} ms "
          f"({dt/M*1e9:.2f} ns/entry over all {M})", flush=True)

print("== batched (K, M/K) dim=1 for reference ==", flush=True)
for K in (8,):
    m = M // K
    kk = key.reshape(K, m)
    pp = tuple(q.reshape(K, m) for q in pays)
    dt = time_fn_device(
        lambda s, k, *p: jax.lax.sort((seeded(s, k),) + p, num_keys=1,
                                      dimension=1),
        (kk,) + pp, reps=6)
    print(f"batched K={K}: {dt*1e3:6.1f} ms ({dt/M*1e9:.2f} ns/entry)",
          flush=True)

print("== binning shape: 2-key 12-op ==", flush=True)
key2 = jnp.asarray(rng.integers(0, 8160, size=(M,)), jnp.float32)
pays12 = tuple(jnp.asarray(rng.uniform(size=(M,)), jnp.float32)
               for _ in range(11))
dt = time_fn_device(
    lambda s, k, *p: jax.lax.sort((seeded(s, k),) + p, num_keys=2),
    (key2,) + pays12, reps=6)
print(f"flat 2key12op M={M}: {dt*1e3:6.1f} ms ({dt/M*1e9:.2f} ns/entry)",
      flush=True)

for K in (8,):
    m = M // K

    def unrolled12(s, k, *p, K=K, m=m):
        outs = []
        for i in range(K):
            sl = lambda a: jax.lax.dynamic_slice_in_dim(a, i * m, m)
            outs.append(jax.lax.sort((seeded(s, sl(k)),) + tuple(
                sl(q) for q in p), num_keys=2))
        return outs

    dt = time_fn_device(unrolled12, (key2,) + pays12, reps=6)
    print(f"unrolled 2key12op K={K} m={m}: {dt*1e3:6.1f} ms "
          f"({dt/M*1e9:.2f} ns/entry)", flush=True)
