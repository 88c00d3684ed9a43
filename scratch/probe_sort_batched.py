"""Does XLA:TPU lax.sort have a size cliff that batched sorts can ride?

Measured round 2 (BENCH.md): 12-operand sort costs 2.2 ns/entry at N=1M but
8.5-10 ns/entry at 4.2M+ — ~4x superlinear somewhere in between. Binning
only needs per-TILE order (cross-tile order is irrelevant: the kernels read
segments via tile_starts), so if (K, M/K) batched sorts run at the small-N
rate, the big sort can be split into K independent group sorts.

Run on hardware: python scratch/probe_sort_batched.py
"""

import jax
import jax.numpy as jnp
import numpy as np

from gaussian_splatting_tpu.utils.cache import enable_compile_cache
from gaussian_splatting_tpu.utils.profiling import time_fn_device

enable_compile_cache()
rng = np.random.default_rng(0)

M = 4_718_592  # the round-2 bench sort size

print("== flat 12-operand sort vs M (find the cliff) ==", flush=True)
for m in (589_824, 1_179_648, 1_769_472, 2_359_296, 3_538_944, M):
    key = jnp.asarray(rng.integers(0, 1 << 23, size=(m,)), jnp.int32)
    pays = tuple(jnp.asarray(rng.uniform(size=(m,)), jnp.float32)
                 for _ in range(11))
    dt = time_fn_device(
        lambda s, k, *p: jax.lax.sort(
            (k ^ (s * 7919.0).astype(jnp.int32),) + p, num_keys=1),
        (key,) + pays, reps=6)
    print(f"flat m={m}: {dt*1e3:6.1f} ms ({dt/m*1e9:.2f} ns/entry)",
          flush=True)

print("== batched (K, M/K) 12-operand sort along axis -1 ==", flush=True)
for K in (2, 4, 8, 16, 32):
    m = M // K
    key = jnp.asarray(rng.integers(0, 1 << 23, size=(K, m)), jnp.int32)
    pays = tuple(jnp.asarray(rng.uniform(size=(K, m)), jnp.float32)
                 for _ in range(11))
    dt = time_fn_device(
        lambda s, k, *p: jax.lax.sort(
            (k ^ (s * 7919.0).astype(jnp.int32),) + p, num_keys=1,
            dimension=1),
        (key,) + pays, reps=6)
    print(f"batched K={K} m={m}: {dt*1e3:6.1f} ms "
          f"({dt/M*1e9:.2f} ns/entry over all {M})", flush=True)

print("== 2-operand (key, idx) flat sort at M ==", flush=True)
key = jnp.asarray(rng.integers(0, 1 << 23, size=(M,)), jnp.int32)
idx = jnp.arange(M, dtype=jnp.int32)
dt = time_fn_device(
    lambda s, k, i: jax.lax.sort(
        (k ^ (s * 7919.0).astype(jnp.int32), i), num_keys=1),
    (key, idx), reps=6)
print(f"2-op flat M={M}: {dt*1e3:6.1f} ms ({dt/M*1e9:.2f} ns/entry)",
      flush=True)

print("== partition_soa + batched sort vs flat 12-op sort (the real plan) ==",
      flush=True)
from gaussian_splatting_tpu.ops.partition import partition_soa, quantum_for

B, C = 16, 512
q = quantum_for(C, B, 1.5)
soa = jnp.asarray(rng.normal(size=(16, M)), jnp.float32)
key = jnp.asarray(rng.integers(0, 8160 * 1024, size=(M,)), jnp.int32)
# exact f32 keys; bucket = low 4 key bits (bucket_shift=0 & (B-1))
soa = soa.at[0, :].set((key % (1 << 22)).astype(jnp.float32))

# Cache-bust through a PAYLOAD row (row 1), never the key row: scaling the
# key would move entries between buckets (ADVICE round-2).
def part_only(s, x):
    return partition_soa(x.at[1].mul(1.0 + (s - 1.0) * 1e-9), B, q,
                         key_row=0, sentinel=float(1 << 23),
                         interpret=False, C=C)

dt = time_fn_device(part_only, (soa,), reps=6)
print(f"partition M={M} B={B} q={q}: {dt*1e3:6.1f} ms", flush=True)

def part_then_sort(s, x):
    rows, counts, drops = part_only(s, x)
    ops = tuple(rows[r] for r in range(12))
    srt = jax.lax.sort(ops, num_keys=1, dimension=1)
    return srt, counts

dt = time_fn_device(part_then_sort, (soa,), reps=6)
print(f"partition+batched-12op-sort M={M} B={B}: {dt*1e3:6.1f} ms",
      flush=True)

ops_flat = tuple(soa[r, :] for r in range(12))
dt = time_fn_device(
    lambda s, *p: jax.lax.sort(
        ((p[0] * s).astype(jnp.float32),) + p[1:], num_keys=1),
    ops_flat, reps=6)
print(f"flat 12-op sort M={M}: {dt*1e3:6.1f} ms", flush=True)
