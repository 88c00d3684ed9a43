"""Round-2 breakdown v4 — HONEST (chained) timings.

v1-v3 used independent perturbed calls; the remote execution layer overlaps
those across its worker pool and memoizes them across processes, so every
round-1 number is suspect. This version serializes every rep through a
host-synced data dependency (utils.profiling.time_fn_chained) and reports a
null-fn calibration for the per-rep readback overhead.
"""

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
from gaussian_splatting_tpu.utils.profiling import time_fn_chained

N = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
width, height = 1920, 1080
ts = 16
MAXT = 16
REPS = 5
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


def t(name, fn, reps=REPS):
    dt = time_fn_chained(fn, reps=reps)
    print(f"  {name}: {dt*1e3:.1f} ms", flush=True)
    return dt


# Null calibration: per-rep overhead of the chained readback.
t("null (chain overhead)", jax.jit(lambda s: s + 1.0), reps=10)

# Raw sort costs at the real sizes.
M8 = 1 << (slots - 1).bit_length()
key = jnp.asarray(rng.integers(0, T << 16, size=(slots,)), jnp.int32)
pays = [jnp.asarray(rng.uniform(size=(slots,)), jnp.float32) for _ in range(11)]
t("raw sort 1key (slots)",
  jax.jit(lambda s: jax.lax.sort(
      (key ^ jnp.int32(s * 7919),), num_keys=1)[0]))
t("raw sort 1key+11pay (slots)",
  jax.jit(lambda s: jax.lax.sort(
      (key ^ jnp.int32(s * 7919),) + tuple(pays), num_keys=1)[0]))
t("raw sort 1key+1pay (slots)",
  jax.jit(lambda s: jax.lax.sort(
      (key ^ jnp.int32(s * 7919), pays[0]), num_keys=1)[0]))

bin_fn = jax.jit(lambda s: isect_and_sort(
    means2d * s, conics, colors, opac, depths, radii,
    width, height, ts, chunk, MAXT, class_budgets=BUD).sorted_soa)
t_bin = t("bin+sort (2key)", bin_fn)

bin_db = jax.jit(lambda s: isect_and_sort(
    means2d * s, conics, colors, opac, depths, radii,
    width, height, ts, chunk, MAXT, class_budgets=BUD,
    depth_bits=16).sorted_soa)
t_bindb = t("bin+sort (depth_bits=16)", bin_db)

gids = jnp.asarray(rng.integers(0, N + 1, size=(pcap,)).astype(np.float32))
gbuf = jnp.concatenate(
    [jnp.asarray(rng.normal(size=(11, pcap)).astype(np.float32)),
     gids[None, :], jnp.zeros((4, pcap), jnp.float32)], axis=0)
red_fn = jax.jit(lambda s: reduce_padded_grads(gbuf * s, N, jnp.int32(pcap)))
t_red = t("grad reduce (sort+cumsum)", red_fn)

fwd = jax.jit(lambda s: rasterize_tiled(
    means2d * s, conics, colors, opac, depths, radii, width, height,
    tile_size=ts, chunk=chunk, max_tiles_per_gaussian=MAXT,
    class_budgets=BUD, interpret=False)[0])
t_fwd = t("full fwd", fwd)


def loss(m, c2, col, o, dd, s_):
    img, alpha, depth = rasterize_tiled(
        m * s_, c2, col, o, dd, radii, width, height,
        tile_size=ts, chunk=chunk, max_tiles_per_gaussian=MAXT,
        class_budgets=BUD, interpret=False)
    return jnp.sum(img) + jnp.sum(alpha) + 0.01 * jnp.sum(depth)


g = jax.jit(jax.grad(loss, argnums=(0, 1, 2, 3, 4)))
t_all = t("full fwd+bwd",
          lambda s: g(means2d, conics, colors, opac, depths, s))
px = width * height
print(f"-> fwd kernel ~{(t_fwd-t_bin)*1e3:.0f} ms | "
      f"bwd-side ~{(t_all-t_fwd)*1e3:.0f} ms (incl reduce {t_red*1e3:.0f}) | "
      f"fwd+bwd {px/t_all/1e6:.2f} Mpix/s", flush=True)
