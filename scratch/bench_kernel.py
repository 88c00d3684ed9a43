"""Benchmark the Pallas rasterizer at target scale: 1M gaussians @ 1080p.

Reports fwd and fwd+bwd wall time and pixels/sec. Run on TPU."""

import time
import sys

import jax
import jax.numpy as jnp
import numpy as np

from gaussian_splatting_tpu.ops.rasterize_pallas import rasterize_tiled, isect_tiles

N = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
width, height = 1920, 1080
print("backend:", jax.default_backend(), "N:", N)

rng = np.random.default_rng(0)
# Screen-space gaussians spread over the image with realistic small radii.
means2d = jnp.asarray(rng.uniform([0, 0], [width, height], size=(N, 2)), jnp.float32)
sx = rng.uniform(1.0, 6.0, size=(N,))
sy = rng.uniform(1.0, 6.0, size=(N,))
th = rng.uniform(0, np.pi, size=(N,))
c, s = np.cos(th), np.sin(th)
# cov = R diag(sx^2, sy^2) R^T
a = c * c * sx**2 + s * s * sy**2
b = c * s * (sx**2 - sy**2)
d = s * s * sx**2 + c * c * sy**2
det = a * d - b * b
conics = jnp.asarray(np.stack([d / det, -b / det, a / det], 1), jnp.float32)
colors = jnp.asarray(rng.uniform(size=(N, 3)), jnp.float32)
opac = jnp.asarray(rng.uniform(0.3, 0.9, size=(N,)), jnp.float32)
depths = jnp.asarray(rng.uniform(1, 10, size=(N,)), jnp.float32)
radii = jnp.asarray(np.ceil(3 * np.sqrt(np.maximum(sx, sy) ** 2)), jnp.int32)

binning = jax.jit(
    lambda m, r, d: isect_tiles(m, r, d, width, height, 16, capacity=8 * N, chunk=256)
)(means2d, radii, depths)
n_isect = int(binning.n_isect)
print(f"total intersections: {n_isect:,} (dropped {int(binning.n_dropped):,})")

cap = 8 * N


def fwd(m, c2, col, o, d):
    img, alpha, depth = rasterize_tiled(
        m, c2, col, o, d, radii, width, height, tile_size=16,
        isect_capacity=cap, chunk=256, interpret=False)
    return img


def loss(m, c2, col, o, d):
    img, alpha, depth = rasterize_tiled(
        m, c2, col, o, d, radii, width, height, tile_size=16,
        isect_capacity=cap, chunk=256, interpret=False)
    return jnp.sum(img) + jnp.sum(alpha)


args = (means2d, conics, colors, opac, depths)
f_fwd = jax.jit(fwd)
f_bwd = jax.jit(jax.grad(loss, argnums=(0, 1, 2, 3, 4)))

t0 = time.time()
f_fwd(*args)[0].block_until_ready()
print("fwd compile:", time.time() - t0)
t0 = time.time()
reps = 5
for _ in range(reps):
    out = f_fwd(*args)
out.block_until_ready()
dt = (time.time() - t0) / reps
px = width * height
print(f"fwd: {dt*1e3:.1f} ms  -> {px/dt/1e6:.1f} Mpix/s  ({n_isect/dt/1e9:.2f} G isect/s)")

t0 = time.time()
jax.block_until_ready(f_bwd(*args))
print("fwd+bwd compile:", time.time() - t0)
t0 = time.time()
for _ in range(reps):
    g = f_bwd(*args)
jax.block_until_ready(g)
dt2 = (time.time() - t0) / reps
print(f"fwd+bwd: {dt2*1e3:.1f} ms -> {px/dt2/1e6:.1f} Mpix/s")
