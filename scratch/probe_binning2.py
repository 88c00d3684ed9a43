"""Round-2: where do the ~60 ms of bin+sort OUTSIDE the raw sort go?

Stages of tiling.isect_and_sort (compact class mode), timed on device:
  A. class-group sort: 1M entries x 17 operands
  B. slot expansion + ellipse cull -> tile_key + 11 quantity cols (concat)
  C. the big (key, depth)-sort           [measured in bench_breakdown5]
  D. searchsorted + counts + padded_starts
  E. SoA stack + pad (16 x M copy)
"""

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

N = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
width, height = 1920, 1080
ts, MAXT, chunk = 16, 16, 256
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

caps = np.asarray(class_caps(MAXT))
nt = np.minimum(exact_tile_counts(means2d, radii, width, height, ts,
                                  conics=np.asarray(conics),
                                  opacities=np.asarray(opac)), MAXT)
cls = np.searchsorted(caps, np.clip(nt, 1, MAXT))
hist = np.bincount(cls[nt > 0], minlength=len(caps))[:len(caps)]
budgets = tuple(int(np.ceil(h * 1.05 / 128) * 128 + 128) for h in hist)
hard_min = tuple(int(np.ceil(h / 128) * 128) for h in hist)
BUD = squeeze_budgets_under_pow2(budgets, hard_min, caps)
slots = total_slots(N, MAXT, BUD)
print(f"slots {slots}", flush=True)


def t(name, fn, args, reps=6):
    dt = time_fn_device(fn, args, reps=reps)
    print(f"  {name}: {dt*1e3:.2f} ms", flush=True)
    return dt


args = (means2d, conics, colors, opac, depths, radii)

# Full binning, and binning minus the big sort.
t("isect_and_sort (full)",
  lambda s, m, c2, col, o, dd, r: isect_and_sort(
      m * s, c2, col, o, dd, r, width, height, ts, chunk, MAXT,
      class_budgets=BUD).sorted_soa, args)
t("isect_and_sort (skip big sort)",
  lambda s, m, c2, col, o, dd, r: isect_and_sort(
      m * s, c2, col, o, dd, r, width, height, ts, chunk, MAXT,
      class_budgets=BUD, _skip_final_sort=True).sorted_soa, args)

# A: the N-sized 17-operand class-group sort alone.
gauss_f32 = jnp.arange(N, dtype=jnp.float32)


def class_sort(s, m, c2, col, o, dd, r):
    clsv = jnp.clip((m[:, 0] * s).astype(jnp.int32) % 8, 0, 7)
    return jax.lax.sort(
        (clsv, dd, m[:, 0], m[:, 1], c2[:, 0], c2[:, 1], c2[:, 2], o,
         col[:, 0], col[:, 1], col[:, 2], gauss_f32,
         r, r, r, r, r),
        num_keys=1)[0]


t("A: N-sort 17 operands", class_sort, args)

# E: stack 16 rows of M + pad.
rows = [jnp.asarray(rng.uniform(size=(slots,)), jnp.float32) for _ in range(10)]


def stack_pad(s, *rs):
    soa = jnp.stack(list(rs) + [rs[0] * s] + [jnp.zeros((slots,), jnp.float32)] * 5, axis=0)
    return jnp.pad(soa, ((0, 0), (0, 2 * chunk)))


t("E: stack16+pad", stack_pad, tuple(rows))
