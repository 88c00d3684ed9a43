"""v3 breakdown: payload-sort binning, pallas fwd, pallas fwd+bwd with
sort-based grad reduction. Cache-busting seeds defeat the axon memoizer."""

import time
import sys

import jax
import jax.numpy as jnp
import numpy as np

from gaussian_splatting_tpu.ops.tiling import isect_and_sort
from gaussian_splatting_tpu.ops.rasterize_pallas import rasterize_tiled

N = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
width, height = 1920, 1080
ts = int(sys.argv[2]) if len(sys.argv) > 2 else 16
chunk = 256
MAXT = 16
REPS = 5
print(f"backend: {jax.default_backend()} N: {N} ts: {ts} chunk: {chunk} maxt: {MAXT}")

rng = np.random.default_rng(0)
means2d = jnp.asarray(rng.uniform([0, 0], [width, height], size=(N, 2)), jnp.float32)
sx = rng.uniform(1.0, 6.0, size=(N,)); sy = rng.uniform(1.0, 6.0, size=(N,))
th = rng.uniform(0, np.pi, size=(N,)); c, s = np.cos(th), np.sin(th)
a = c*c*sx**2 + s*s*sy**2; b = c*s*(sx**2-sy**2); d = s*s*sx**2 + c*c*sy**2
det = a*d - b*b
conics = jnp.asarray(np.stack([d/det, -b/det, a/det], 1), jnp.float32)
colors = jnp.asarray(rng.uniform(size=(N, 3)), jnp.float32)
opac = jnp.asarray(rng.uniform(0.3, 0.9, size=(N,)), jnp.float32)
depths = jnp.asarray(rng.uniform(1, 10, size=(N,)), jnp.float32)
radii = jnp.asarray(np.ceil(3*np.sqrt(np.maximum(sx, sy)**2)), jnp.int32)
seeds = [jnp.float32(1.0 + 1e-6 * i) for i in range(REPS + 1)]


def timeit(name, fn, reps=REPS):
    out = fn(seeds[-1])
    jax.block_until_ready(out)
    t0 = time.time()
    for i in range(reps):
        out = fn(seeds[i])
    jax.block_until_ready(out)
    dt = (time.time() - t0) / reps
    print(f"{name}: {dt*1e3:.1f} ms", flush=True)
    return out, dt


b, t_bin = timeit("isect_and_sort (payload sort)", jax.jit(
    lambda s: isect_and_sort(means2d * s, conics, colors, opac, depths, radii,
                             width, height, ts, chunk, MAXT)))
print("  n_isect:", int(b.n_isect), " dropped:", int(b.n_dropped))

fwd = jax.jit(lambda s: rasterize_tiled(
    means2d * s, conics, colors, opac, depths, radii, width, height,
    tile_size=ts, chunk=chunk, max_tiles_per_gaussian=MAXT, interpret=False)[0])
_, t_fwd = timeit("full fwd (sort+kernel)", fwd)


def loss(m, c2, col, o, dd, s_):
    img, alpha, depth = rasterize_tiled(
        m * s_, c2, col, o, dd, radii, width, height,
        tile_size=ts, chunk=chunk, max_tiles_per_gaussian=MAXT, interpret=False)
    return jnp.sum(img) + jnp.sum(alpha) + 0.01 * jnp.sum(depth)


g = jax.jit(jax.grad(loss, argnums=(0, 1, 2, 3, 4)))
_, t_all = timeit("full fwd+bwd (incl grad reduce)",
                  lambda s: g(means2d, conics, colors, opac, depths, s))

px = width * height
print(f"\nfwd  {px/t_fwd/1e6:.1f} Mpix/s   fwd+bwd {px/t_all/1e6:.1f} Mpix/s")
