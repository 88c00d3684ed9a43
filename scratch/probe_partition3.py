"""Round-3 decision probe: partition + batched sort vs the flat binning
sort, at the bench size. Run on hardware:
    cd /root/repo && python scratch/probe_partition3.py
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

M = 4_718_592  # the round-2 bench sort size
T = 8160       # 1080p/16 tile count

key = jnp.asarray(rng.integers(0, T, size=(M,)), jnp.int32)
pays = tuple(jnp.asarray(rng.uniform(size=(M,)), jnp.float32)
             for _ in range(11))

print("== flat 12-operand sort at M (the round-2 binning sort) ==", flush=True)
dt = time_fn_device(
    lambda s, k, *p: jax.lax.sort(
        (k ^ (s * 7919.0).astype(jnp.int32),) + p, num_keys=1),
    (key,) + pays, reps=6)
print(f"flat m={M}: {dt*1e3:6.1f} ms ({dt/M*1e9:.2f} ns/entry)", flush=True)

print("== batched (K, M/K) 12-operand sort along axis -1 ==", flush=True)
for K in (8, 16):
    m = M // K
    bkey = jnp.asarray(rng.integers(0, T, size=(K, m)), jnp.int32)
    bpays = tuple(jnp.asarray(rng.uniform(size=(K, m)), jnp.float32)
                  for _ in range(11))
    dt = time_fn_device(
        lambda s, k, *p: jax.lax.sort(
            (k ^ (s * 7919.0).astype(jnp.int32),) + p, num_keys=1,
            dimension=1),
        (bkey,) + bpays, reps=6)
    print(f"batched K={K} m={m}: {dt*1e3:6.1f} ms "
          f"({dt/M*1e9:.2f} ns/entry over all {M})", flush=True)

print("== B separate flat sorts, unrolled (vs batched) ==", flush=True)
for K in (8, 16):
    m = M // K
    bkey = jnp.asarray(rng.integers(0, T, size=(K, m)), jnp.int32)
    bpays = tuple(jnp.asarray(rng.uniform(size=(K, m)), jnp.float32)
                  for _ in range(11))

    def unrolled(s, k, *p, K=K):
        outs = []
        for i in range(K):
            srt = jax.lax.sort(
                (k[i] ^ (s * 7919.0).astype(jnp.int32),)
                + tuple(pp[i] for pp in p), num_keys=1)
            outs.append(srt[1])
        return outs

    dt = time_fn_device(unrolled, (bkey,) + bpays, reps=6)
    print(f"unrolled K={K} m={m}: {dt*1e3:6.1f} ms "
          f"({dt/M*1e9:.2f} ns/entry over all {M})", flush=True)

print("== partition_soa alone and partition+batched sort ==", flush=True)
from gaussian_splatting_tpu.ops.partition import partition_soa

for B, C in ((16, 512), (8, 512)):
    cap = ((M // B * 5 // 4) // C) * C          # 1.25x slack, C-aligned
    soa = jnp.asarray(rng.normal(size=(16, M)), jnp.float32)
    k_np = rng.integers(0, T, size=(M,))
    soa = soa.at[0, :].set(jnp.asarray(k_np, jnp.float32))
    soa = soa.at[15, :].set(jnp.asarray(k_np % B, jnp.float32))

    def part_only(s, x, B=B, C=C, cap=cap):
        # seed-perturb a payload row only (row 1), keeping keys/buckets exact
        x = x.at[1].mul(s)
        return partition_soa(x, (cap,) * B, bucket_row=15, key_row=0,
                             sentinel=float(T), interpret=False, C=C)

    dt = time_fn_device(part_only, (soa,), reps=6)
    print(f"partition M={M} B={B} C={C}: {dt*1e3:6.1f} ms", flush=True)

    def part_sort(s, x, B=B, C=C, cap=cap):
        out, counts, drops = part_only(s, x, B, C, cap)
        ops = tuple(out[r].reshape(B, cap) for r in range(12))
        srt = jax.lax.sort(ops, num_keys=1, dimension=1)
        return srt, counts

    dt = time_fn_device(part_sort, (soa,), reps=6)
    print(f"partition+batched-sort M={M} B={B} cap={cap} "
          f"(total {B*cap}): {dt*1e3:6.1f} ms", flush=True)
