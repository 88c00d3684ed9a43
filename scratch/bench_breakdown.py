"""Break down rasterizer time: binning sort, SoA gather, pallas fwd, pallas
bwd, scatter-add VJP.

The axon remote-TPU layer memoizes pure executions on identical inputs, so
every timed call gets a slightly different input (cache-busting seeds)."""

import time
import sys

import jax
import jax.numpy as jnp
import numpy as np

from gaussian_splatting_tpu.ops.tiling import isect_tiles, build_soa, padded_capacity_for, cdiv
from gaussian_splatting_tpu.ops.rasterize_pallas import _make_rasterizer

N = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
width, height = 1920, 1080
ts, chunk = 16, 256
ntx, nty = cdiv(width, ts), cdiv(height, ts)
T = ntx * nty
MAXT = 16
pcap = padded_capacity_for(N, MAXT, T, chunk)
REPS = 5
print("backend:", jax.default_backend(), "N:", N, "T:", T, "pcap:", pcap)

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


bin_fn = jax.jit(lambda s: isect_tiles(means2d * s, radii, depths, width, height, ts,
                                       chunk=chunk, max_tiles_per_gaussian=MAXT,
                                       need_inverse=True))
binning, t_bin = timeit("isect_tiles (sort+scatter)", bin_fn)
print("  n_isect:", int(binning.n_isect))

soa_fn = jax.jit(lambda s: build_soa(means2d * s, conics, colors, opac, depths,
                                     binning.padded_gauss, binning.slot_to_padded))
soa, t_soa = timeit("build_soa (row gather)", soa_fn)

raster = _make_rasterizer(ts, ntx, nty, chunk, pcap, False)
fwd_fn = jax.jit(lambda s: raster(soa * s, binning.padded_starts, binning.counts))
out, t_fwd = timeit("pallas fwd kernel", fwd_fn)

g = jnp.ones_like(out)
bwd_fn = jax.jit(
    lambda s: jax.vjp(lambda x: raster(x, binning.padded_starts, binning.counts), soa * s)[1](g)[0]
)
_, t_fb = timeit("pallas fwd+bwd kernel", bwd_fn)


def gather_scatter(s):
    m2 = means2d * s
    def f(m2, c2, col, o, d):
        s2 = build_soa(m2, c2, col, o, d, binning.padded_gauss, binning.slot_to_padded)
        return jnp.sum(s2 * soa)
    return jax.grad(f, argnums=(0, 1, 2, 3, 4))(m2, conics, colors, opac, depths)


scat_fn = jax.jit(gather_scatter)
_, t_scat = timeit("gather+slot-reduce VJP", scat_fn)

px = width * height
fwd_total = t_bin + t_soa + t_fwd
bwd_total = t_bin + t_soa + t_fb + (t_scat - t_soa)
print(f"\nfwd total {fwd_total*1e3:.1f} ms -> {px/fwd_total/1e6:.1f} Mpix/s")
print(f"fwd+bwd total {bwd_total*1e3:.1f} ms -> {px/bwd_total/1e6:.1f} Mpix/s")
