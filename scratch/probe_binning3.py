"""Why does the in-situ big sort cost ~71 ms when the identical raw sort is
~48 ms? Hypothesis: XLA fuses the slot-expansion producers into the sort
(recomputing them per pass / inflating operand reads). Test: same binning
with an optimization_barrier between enumeration and lax.sort."""

import sys

import jax
import jax.numpy as jnp
import numpy as np

from gaussian_splatting_tpu.utils.cache import enable_compile_cache

enable_compile_cache()

from gaussian_splatting_tpu.ops import tiling
from gaussian_splatting_tpu.ops.tiling import (
    class_caps, exact_tile_counts, squeeze_budgets_under_pow2, total_slots)
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
print("slots", total_slots(N, MAXT, BUD), flush=True)

args = (means2d, conics, colors, opac, depths, radii)


def t(name, fn, args, reps=6):
    dt = time_fn_device(fn, args, reps=reps)
    print(f"  {name}: {dt*1e3:.2f} ms", flush=True)
    return dt


orig_sort = jax.lax.sort


def barrier_sort(operands, num_keys=1, **kw):
    if isinstance(operands, (list, tuple)) and len(operands) >= 12:
        operands = jax.lax.optimization_barrier(tuple(operands))
    return orig_sort(operands, num_keys=num_keys, **kw)


t("binning (as-is)",
  lambda s, m, c2, col, o, dd, r: tiling.isect_and_sort(
      m * s, c2, col, o, dd, r, width, height, ts, chunk, MAXT,
      class_budgets=BUD).sorted_soa, args)

jax.lax.sort = barrier_sort
tiling.jax.lax.sort = barrier_sort
try:
    t("binning (barrier before big sort)",
      lambda s, m, c2, col, o, dd, r: tiling.isect_and_sort(
          m * s, c2, col, o, dd, r, width, height, ts, chunk, MAXT,
          class_budgets=BUD).sorted_soa, args)
finally:
    jax.lax.sort = orig_sort
