"""Dissect the 268 ms grad-reduce: sort vs cumsum vs searchsorted vs take,
plus cheaper alternatives for each piece. Honest on-device timing."""

import jax
import jax.numpy as jnp
import numpy as np

from gaussian_splatting_tpu.utils.cache import enable_compile_cache
from gaussian_splatting_tpu.utils.profiling import time_fn_device

enable_compile_cache()
rng = np.random.default_rng(0)

N = 1_000_000
pcap = 8_250_624
key = jnp.asarray(np.sort(rng.integers(0, N + 1, size=(pcap,))).astype(np.float32))
rows = tuple(jnp.asarray(rng.normal(size=(pcap,)).astype(np.float32))
             for _ in range(10))
stacked = jnp.stack(rows, axis=0)
queries = jnp.arange(N + 1, dtype=jnp.float32)


def t(name, fn, args, reps=6):
    dt = time_fn_device(fn, args, reps=reps)
    print(f"  {name}: {dt*1e3:.1f} ms", flush=True)
    return dt


t("sort 1key+10pay @8.25M", lambda s, k, *p: jax.lax.sort(
    (jnp.where(s > 0, k, -k),) + p, num_keys=1), (key,) + rows)

t("cumsum (10, 8.25M) axis=1", lambda s, x: jnp.cumsum(x * s, axis=1),
  (stacked,))

t("mask 11 rows (where pos_ok)", lambda s, x: tuple(
    jnp.where(jnp.arange(pcap) < jnp.int32(pcap * 0.6), x[i] * s, 0.0)
    for i in range(10)), (stacked,))

t("searchsorted 1M queries in 8.25M", lambda s, k, q: jnp.searchsorted(
    k, q * s), (key, queries))

seg = jnp.asarray(np.sort(rng.integers(0, pcap + 1, size=(N + 1,))).astype(np.int32))
t("take (10, 8.25M) at 1M+1 cols", lambda s, x, g: jnp.take(
    x * s, g, axis=1), (stacked, seg))

# Alternative epilogue: segment ends only -> diff of gathered bounds is
# equivalent to gathering at starts and subtracting; try int32 gather of one
# row then vmap-free 10-row take with transpose-friendly layout.
t("take (8.25M,) x10 rows separately", lambda s, x, g: tuple(
    jnp.take(x[i] * s, g) for i in range(10)), (stacked, seg))

from gaussian_splatting_tpu.ops.tiling import reduce_padded_grads

gbuf = jnp.concatenate(
    [stacked, key[None, :] * 0, key[None, :],
     jnp.zeros((4, pcap), jnp.float32)], axis=0)
t("full reduce_padded_grads", lambda s, gb: reduce_padded_grads(
    gb * s, N, jnp.int32(pcap)), (gbuf,))
