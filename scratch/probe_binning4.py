"""Isolate the in-situ big-sort gap (71 ms inside isect_and_sort vs 48.5 ms
on random keys): key distribution (uniform vs sentinel-heavy) with real
payload values, searchsorted cost, and the post-transpose enum cost."""

import sys

import jax
import jax.numpy as jnp
import numpy as np

from gaussian_splatting_tpu.utils.cache import enable_compile_cache

enable_compile_cache()

from gaussian_splatting_tpu.ops.tiling import (
    class_caps, exact_tile_counts, isect_and_sort, squeeze_budgets_under_pow2,
    total_slots, cdiv)
from gaussian_splatting_tpu.utils.profiling import time_fn_device

N = 1_000_000
width, height = 1920, 1080
ts, MAXT, chunk = 16, 16, 256
print(f"backend: {jax.default_backend()}", flush=True)

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

caps = np.asarray(class_caps(MAXT))
nt = np.minimum(exact_tile_counts(means2d, radii, width, height, ts,
                                  conics=np.asarray(conics),
                                  opacities=np.asarray(opac)), MAXT)
cls = np.searchsorted(caps, np.clip(nt, 1, MAXT))
hist = np.bincount(cls[nt > 0], minlength=len(caps))[:len(caps)]
budgets = tuple(int(np.ceil(h * 1.05 / 128) * 128 + 128) for h in hist)
hard_min = tuple(int(np.ceil(h / 128) * 128) for h in hist)
BUD = squeeze_budgets_under_pow2(budgets, hard_min, caps)
M = total_slots(N, MAXT, BUD)
print("slots", M, flush=True)


def t(name, fn, args, reps=6):
    dt = time_fn_device(fn, args, reps=reps)
    print(f"  {name}: {dt*1e3:.2f} ms", flush=True)
    return dt


args = (means2d, conics, colors, opac, depths, radii)

t("isect_and_sort (full, post-transpose)",
  lambda s, m, c2, col, o, dd, r: isect_and_sort(
      m * s, c2, col, o, dd, r, width, height, ts, chunk, MAXT,
      class_budgets=BUD).sorted_soa, args)
t("isect_and_sort (skip big sort)",
  lambda s, m, c2, col, o, dd, r: isect_and_sort(
      m * s, c2, col, o, dd, r, width, height, ts, chunk, MAXT,
      class_budgets=BUD, _skip_final_sort=True).sorted_soa, args)

Tt = cdiv(width, ts) * cdiv(height, ts)
pays = tuple(jnp.asarray(rng.uniform(size=(M,)), jnp.float32)
             for _ in range(11))


def sort12(s, k, *p):
    # Perturb a payload (not the key) so the key distribution is preserved
    # while the fori_loop carry still forces fresh executions.
    return jax.lax.sort((k, p[0] * s) + p[1:], num_keys=2)


key_uni = jnp.asarray(rng.integers(0, Tt, size=(M,)), jnp.int32)
t("sort 2key+10pay, uniform key", sort12, (key_uni,) + pays[:11])

mask = rng.uniform(size=M) < 0.20
key_sen = jnp.asarray(np.where(mask, Tt, rng.integers(0, Tt, size=M)),
                      jnp.int32)
t("sort 2key+10pay, 20% sentinel key", sort12, (key_sen,) + pays[:11])

# Skewed-occupancy key: tile ids drawn with the real per-tile occupancy
# shape (a few hundred entries per tile, heavy center), plus sentinels.
occ = rng.integers(0, Tt, size=(M,))
key_skew = jnp.asarray(np.where(mask, Tt, np.sort(occ)[
    rng.integers(0, M, size=M)]), jnp.int32)
t("sort 2key+10pay, skewed+sentinel key", sort12, (key_skew,) + pays[:11])

key_sorted = jnp.sort(key_sen)
q = jnp.arange(Tt + 1, dtype=jnp.int32)
t("searchsorted (T+1 queries over M)",
  lambda s, ks: jnp.searchsorted(ks, q + (s > 2.0).astype(jnp.int32)),
  (key_sorted,))
