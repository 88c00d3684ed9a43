"""Round-2b probe: measure the four hot-path trims on hardware.

Stages at the north star (1M @ 1080p): binning (with the Pallas pack),
fwd, fwd+bwd at grad_buffer_frac 1.0, occupancy meta, fwd+bwd at the
fitted frac.  On-device chained timing throughout."""

import sys

import jax
import jax.numpy as jnp
import numpy as np

from gaussian_splatting_tpu.utils.cache import enable_compile_cache

enable_compile_cache()

from gaussian_splatting_tpu.ops.tiling import (
    class_caps, exact_tile_counts, isect_and_sort, squeeze_budgets_under_pow2,
    total_slots, cdiv)
from gaussian_splatting_tpu.ops.rasterize_pallas import (
    rasterize_tiled, rasterize_grad_meta)
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
budgets = tuple(int(np.ceil(h * 1.05 / 128) * 128 + 128) for h in hist)
hard_min = tuple(int(np.ceil(h / 128) * 128) for h in hist)
BUD = squeeze_budgets_under_pow2(budgets, hard_min, caps)
slots = total_slots(N, MAXT, BUD)
print(f"chunk {chunk}: slots {slots}", flush=True)

bin_args = (means2d, conics, colors, opac, depths, radii)


def t(name, fn, args, reps=REPS):
    dt = time_fn_device(fn, args, reps=reps)
    print(f"  {name}: {dt*1e3:.2f} ms", flush=True)
    return dt


t("null", lambda s: s + 1.0, ())

t_bin = t("bin+sort+pack",
          lambda s, m, c2, col, o, dd, r: isect_and_sort(
              m * s, c2, col, o, dd, r, width, height, ts, chunk, MAXT,
              class_budgets=BUD).sorted_soa, bin_args)

# Exact occupancy at this scene.
nw, nd, cap = jax.jit(
    lambda m, c2, col, o, dd, r: rasterize_grad_meta(
        m, c2, col, o, dd, r, width, height, tile_size=ts, chunk=chunk,
        max_tiles_per_gaussian=MAXT, class_budgets=BUD))(*bin_args)
nw, nd, cap = int(nw), int(nd), int(cap)
print(f"  grad occupancy: written {nw} dropped {nd} cap {cap} "
      f"({100.0*nw/cap:.1f}%)", flush=True)

t_fwd = t("full fwd", lambda s, m, c2, col, o, dd, r: rasterize_tiled(
    m * s, c2, col, o, dd, r, width, height,
    tile_size=ts, chunk=chunk, max_tiles_per_gaussian=MAXT,
    class_budgets=BUD, interpret=False)[0], bin_args)


def make_loss(frac):
    def loss(s_, m, c2, col, o, dd, r):
        img, alpha, depth = rasterize_tiled(
            m * s_, c2, col, o, dd, r, width, height,
            tile_size=ts, chunk=chunk, max_tiles_per_gaussian=MAXT,
            class_budgets=BUD, grad_buffer_frac=frac, interpret=False)
        return jnp.sum(img) + jnp.sum(alpha) + 0.01 * jnp.sum(depth)
    return loss


t_all = t("full fwd+bwd frac=1.0",
          lambda s, *a: jax.grad(make_loss(1.0), argnums=(1, 2, 3, 4, 5))(s, *a),
          bin_args)

frac = min(1.0, (nw * 1.10 + 2 * chunk) / slots)
print(f"  fitted frac: {frac:.3f}", flush=True)
t_fit = t(f"full fwd+bwd frac={frac:.3f}",
          lambda s, *a: jax.grad(make_loss(frac), argnums=(1, 2, 3, 4, 5))(s, *a),
          bin_args)

px = width * height
print(f"-> fwd {px/t_fwd/1e6:.2f} | fwd+bwd(1.0) {px/t_all/1e6:.2f} | "
      f"fwd+bwd(fit) {px/t_fit/1e6:.2f} Mpix/s", flush=True)
