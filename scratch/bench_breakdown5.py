"""Round-2 breakdown v5 — on-device chained timing (time_fn_device).

One remote execution per measurement: reps run inside a jitted fori_loop
with a carry dependency, so nothing can be overlapped or memoized, and the
~55 ms tunnel RTT cancels in the (t_reps - t_1)/(reps-1) difference.
All arrays are passed as jit ARGUMENTS (closures embed them as HLO
constants -> 270 MB compile requests, HTTP 413)."""

import sys

import jax
import jax.numpy as jnp
import numpy as np

from gaussian_splatting_tpu.utils.cache import enable_compile_cache

enable_compile_cache()

from gaussian_splatting_tpu.ops.tiling import (
    class_caps, exact_tile_counts, fill_budgets_to_pow2, isect_and_sort,
    padded_capacity_for, reduce_padded_grads, total_slots, cdiv)
from gaussian_splatting_tpu.ops.rasterize_pallas import rasterize_tiled
from gaussian_splatting_tpu.utils.profiling import time_fn_device

N = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
width, height = 1920, 1080
ts = 16
MAXT = 16
REPS = 6
print(f"backend: {jax.default_backend()} N: {N}", flush=True)

rng = np.random.default_rng(0)
means2d = jnp.asarray(rng.uniform([0, 0], [width, height], size=(N, 2)), jnp.float32)
sx = rng.lognormal(mean=0.8, sigma=0.5, size=(N,)).clip(0.7, 12.0)
sy = rng.lognormal(mean=0.8, sigma=0.5, size=(N,)).clip(0.7, 12.0)
th = rng.uniform(0, np.pi, size=(N,)); c, s = np.cos(th), np.sin(th)
a = c*c*sx**2 + s*s*sy**2; b = c*s*(sx**2-sy**2); d = s*s*sx**2 + c*c*sy**2
det = a*d - b*b
conics = jnp.asarray(np.stack([d/det, -b/det, a/det], 1), jnp.float32)
colors = jnp.asarray(rng.uniform(size=(N, 3)), jnp.float32)
opac = jnp.asarray(rng.uniform(0.3, 0.9, size=(N,)), jnp.float32)
depths = jnp.asarray(rng.uniform(1, 10, size=(N,)), jnp.float32)
radii = jnp.asarray(np.ceil(3 * np.maximum(sx, sy)), jnp.int32)

T = cdiv(width, ts) * cdiv(height, ts)
caps = np.asarray(class_caps(MAXT))
nt = np.minimum(exact_tile_counts(means2d, radii, width, height, ts,
                                  conics=np.asarray(conics),
                                  opacities=np.asarray(opac)), MAXT)
cls = np.searchsorted(caps, np.clip(nt, 1, MAXT))
hist = np.bincount(cls[nt > 0], minlength=len(caps))[:len(caps)]

chunk = 256
BUD = fill_budgets_to_pow2(
    tuple(int(np.ceil(h * 1.05 / 128) * 128 + 128) for h in hist),
    caps, overhead=T * chunk)
slots = total_slots(N, MAXT, BUD)
pcap = padded_capacity_for(slots, T, chunk)
print(f"chunk {chunk}: slots {slots} pcap {pcap}", flush=True)


def t(name, fn, args, reps=REPS):
    dt = time_fn_device(fn, args, reps=reps)
    print(f"  {name}: {dt*1e3:.2f} ms", flush=True)
    return dt


t("null", lambda s: s + 1.0, ())

key = jnp.asarray(rng.integers(0, T << 16, size=(slots,)), jnp.int32)
pays = tuple(jnp.asarray(rng.uniform(size=(slots,)), jnp.float32)
             for _ in range(11))

t("raw sort 1key", lambda s, k: jax.lax.sort(
    (k ^ (s * 7919.0).astype(jnp.int32),), num_keys=1), (key,))
t("raw sort 1key+1pay", lambda s, k, p: jax.lax.sort(
    (k ^ (s * 7919.0).astype(jnp.int32), p), num_keys=1), (key, pays[0]))
t("raw sort 1key+3pay", lambda s, k, *p: jax.lax.sort(
    (k ^ (s * 7919.0).astype(jnp.int32),) + p, num_keys=1),
  (key,) + pays[:3])
t("raw sort 1key+11pay", lambda s, k, *p: jax.lax.sort(
    (k ^ (s * 7919.0).astype(jnp.int32),) + p, num_keys=1),
  (key,) + pays)
t("raw sort 2key+10pay", lambda s, k, *p: jax.lax.sort(
    (k ^ (s * 7919.0).astype(jnp.int32),) + p, num_keys=2),
  (key, pays[0]) + pays[1:10])

# Gather: reorder an (N, 16) row table by slots-sized random indices.
table = jnp.asarray(rng.normal(size=(N, 16)).astype(np.float32))
gidx = jnp.asarray(rng.integers(0, N, size=(slots,)), jnp.int32)
t("gather slots x 16 rows", lambda s, tb, gi: jnp.take(
    tb * s, gi, axis=0), (table, gidx))

bin_args = (means2d, conics, colors, opac, depths, radii)
t_bin = t("bin+sort (2key)",
          lambda s, m, c2, col, o, dd, r: isect_and_sort(
              m * s, c2, col, o, dd, r, width, height, ts, chunk, MAXT,
              class_budgets=BUD).sorted_soa, bin_args)

gids = jnp.asarray(rng.integers(0, N + 1, size=(pcap,)).astype(np.float32))
gbuf = jnp.concatenate(
    [jnp.asarray(rng.normal(size=(11, pcap)).astype(np.float32)),
     gids[None, :], jnp.zeros((4, pcap), jnp.float32)], axis=0)
t_red = t("grad reduce (sort+cumsum)",
          lambda s, gb: reduce_padded_grads(gb * s, N, jnp.int32(pcap)),
          (gbuf,))

t_fwd = t("full fwd", lambda s, m, c2, col, o, dd, r: rasterize_tiled(
    m * s, c2, col, o, dd, r, width, height,
    tile_size=ts, chunk=chunk, max_tiles_per_gaussian=MAXT,
    class_budgets=BUD, interpret=False)[0], bin_args)


def loss(s_, m, c2, col, o, dd, r):
    img, alpha, depth = rasterize_tiled(
        m * s_, c2, col, o, dd, r, width, height,
        tile_size=ts, chunk=chunk, max_tiles_per_gaussian=MAXT,
        class_budgets=BUD, interpret=False)
    return jnp.sum(img) + jnp.sum(alpha) + 0.01 * jnp.sum(depth)


t_all = t("full fwd+bwd",
          lambda s, *a: jax.grad(loss, argnums=(1, 2, 3, 4, 5))(s, *a),
          bin_args)
px = width * height
print(f"-> fwd kernel ~{(t_fwd-t_bin)*1e3:.0f} ms | "
      f"bwd-side ~{(t_all-t_fwd)*1e3:.0f} ms (incl reduce {t_red*1e3:.0f}) | "
      f"fwd {px/t_fwd/1e6:.2f} | fwd+bwd {px/t_all/1e6:.2f} Mpix/s",
      flush=True)
