"""How much does the output detile transpose cost NOW (fwd and fwd+bwd)?

Compares rasterize_tiled (returns (H, W) images — pays the XLA detile
transpose both ways) against the raw custom_vjp core (returns the kernel's
(T, 8, P) layout — no transpose; loss summed directly on the tiled buffer).
The difference bounds what a raster-order kernel output could save
(VERDICT round-2 #5).

Run on hardware: python scratch/probe_detile.py [N]
"""

import sys

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from gaussian_splatting_tpu.utils.cache import enable_compile_cache

enable_compile_cache()

from gaussian_splatting_tpu.ops.rasterize_pallas import (
    _make_core, rasterize_tiled)
from gaussian_splatting_tpu.ops.tiling import (
    class_caps, exact_tile_counts, squeeze_budgets_under_pow2, cdiv)
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
BUD = tuple(int(np.ceil(h * 1.05 / 128) * 128 + 128) for h in hist)
hard_min = tuple(int(np.ceil(h / 128) * 128) for h in hist)
BUD = squeeze_budgets_under_pow2(BUD, hard_min, caps)

ntx, nty = cdiv(width, ts), cdiv(height, ts)
core = _make_core(ts, ntx, nty, chunk, N, MAXT, width, height, False,
                  class_budgets=BUD, grad_frac=0.87, depth_grad=False,
                  reduce_slices=4)
args = (means2d, conics, colors, opac, depths, radii)


def fwd_full(s, m, c2, col, o, dd, r):
    img, alpha, _ = rasterize_tiled(
        m * s, c2, col, o, dd, r, width, height, tile_size=ts, chunk=chunk,
        max_tiles_per_gaussian=MAXT, class_budgets=BUD, interpret=False,
        grad_buffer_frac=0.87, reduce_slices=4, depth_grad=False)
    return jnp.sum(img) + jnp.sum(alpha)


def fwd_core(s, m, c2, col, o, dd, r):
    # Known bias (noted, not masked): this sums the raw (T, 8, P) buffer
    # including the 8 padded rows of the bottom tile band (1080 -> 68 tile
    # rows = 1088 px), so the core path carries slightly more loss/gradient
    # work than fwd_full's [:height, :width] crop. The extra is 8/1088 of
    # one tile band (~0.7% of pixels) — small against the transpose cost
    # this probe isolates, and masking it here would itself add a
    # (T, 8, P)-shaped select to the core path being timed.
    out, *_ = core(m * s, c2, col, o, dd, r)
    return jnp.sum(out[:, 0:3]) + jnp.sum(out[:, 4])


for name, fn in (("full (H,W)", fwd_full), ("core (T,8,P)", fwd_core)):
    dt = time_fn_device(fn, args, reps=6)
    print(f"fwd  {name}: {dt*1e3:7.1f} ms", flush=True)
    g = jax.grad(fn, argnums=(1, 2, 3, 4, 5))
    dt = time_fn_device(lambda s, *a: g(s, *a), args, reps=6)
    print(f"f+b  {name}: {dt*1e3:7.1f} ms", flush=True)
