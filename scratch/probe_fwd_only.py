"""Post-transpose forward-only timing at the north-star config."""

import jax
import jax.numpy as jnp
import numpy as np

from gaussian_splatting_tpu.utils.cache import enable_compile_cache

enable_compile_cache()

from gaussian_splatting_tpu.ops.tiling import (
    class_caps, exact_tile_counts, squeeze_budgets_under_pow2)
from gaussian_splatting_tpu.ops.rasterize_pallas import rasterize_tiled
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

args = (means2d, conics, colors, opac, depths, radii)
dt = time_fn_device(
    lambda s_, m, c2, col, o, dd, r: rasterize_tiled(
        m * s_, c2, col, o, dd, r, width, height, tile_size=ts, chunk=chunk,
        max_tiles_per_gaussian=MAXT, class_budgets=BUD, interpret=False)[0],
    args, reps=6)
print(f"full fwd: {dt*1e3:.2f} ms = {width*height/dt/1e6:.2f} Mpix/s",
      flush=True)
