"""Probe: lax.sort cost vs length and operand count on this chip, with
per-call input perturbation (the axon remote layer memoizes pure executions
on identical inputs — BENCH.md methodology)."""

import time

import jax
import jax.numpy as jnp
import numpy as np

from gaussian_splatting_tpu.utils.cache import enable_compile_cache

enable_compile_cache()

rng = np.random.default_rng(0)
REPS = 5


def timeit(name, fn, *args, reps=REPS):
    t0 = time.time()
    out = jax.block_until_ready(fn(jnp.int32(12345), *args))
    t_compile = time.time() - t0
    t0 = time.time()
    for i in range(reps):
        out = fn(jnp.int32(i), *args)
    jax.block_until_ready(out)
    dt = (time.time() - t0) / reps
    print(f"{name}: first {t_compile:.1f}s run {dt*1e3:.2f} ms", flush=True)
    return dt


for M in (2 * 1024**2, 8 * 1024**2):
    key_i = jnp.asarray(rng.integers(0, 1 << 29, size=(M,)), jnp.int32)
    key_f = jnp.asarray(rng.uniform(size=(M,)), jnp.float32)
    pay = [jnp.asarray(rng.uniform(size=(M,)), jnp.float32) for _ in range(11)]

    # Perturbation: xor the key with a tiny per-call seed (changes input
    # bytes, leaves sort cost statistics intact).
    f1 = jax.jit(lambda s, k: jax.lax.sort((k ^ s,), num_keys=1))
    f2 = jax.jit(lambda s, k, p: jax.lax.sort((k ^ s, p), num_keys=1))
    f12 = jax.jit(lambda s, k, *ps: jax.lax.sort((k ^ s,) + ps, num_keys=1))
    f2k = jax.jit(
        lambda s, k, d, *ps: jax.lax.sort((k ^ s, d) + ps, num_keys=2))

    print(f"== M = {M}", flush=True)
    timeit("  int32 key only", f1, key_i)
    timeit("  int32 key + 1 payload", f2, key_i, pay[0])
    timeit("  int32 key + 11 payloads", f12, key_i, *pay)
    timeit("  2 keys (int,f32) + 10 payloads", f2k, key_i, key_f, *pay[:10])
