"""Round-5 consolidated in-situ sweep (VERDICT #5): full fwd+bwd through
rasterize_tiled at the bench scene (1M @ 1080p), one flag combo per run:

  base      : round-3 flags (queue on, flat sort, reduce_slices=4)
  loop      : queue=False (the round-3 while-loop kernels) — settles the
              9.84 -> 9.45 Mpix/s headline regression
  bandsK    : sort_bands=K band-split binning (budgets = per-band max)
  direct    : direct_dma=True at the best-so-far config
  db16      : depth_bits=16 single-key flat sort
  combo     : best flags from the above

Run: python scratch/probe_insitu_r5.py [configs e.g. base,loop,bands4]
Prints ms/step and Mpix/s for each config.
"""

import sys

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from gaussian_splatting_tpu.utils.cache import enable_compile_cache

enable_compile_cache()

from gaussian_splatting_tpu.ops.rasterize_pallas import (
    rasterize_grad_meta, rasterize_tiled)
from gaussian_splatting_tpu.ops.tiling import (
    cdiv, class_caps, exact_tile_counts, squeeze_budgets_under_pow2,
    total_slots)
from gaussian_splatting_tpu.utils.profiling import time_fn_device

WANT = (sys.argv[1].split(",") if len(sys.argv) > 1
        else "base,loop,bands2,bands4,bands8,direct,db16".split(","))
N = 1_000_000
width, height = 1920, 1080
ts, MAXT, chunk = 16, 16, 256
REPS = 6
on_tpu = jax.default_backend() == "tpu"
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
nty = cdiv(height, ts)


def budgets_for(bands: int):
    """Class budgets sized for the heaviest band (bands=0 -> full frame),
    mirroring bench.py's measure + squeeze."""
    K = max(bands, 1)
    band_h = cdiv(nty, K)
    hist = np.zeros(len(caps), np.int64)
    for k in range(K):
        lo, hi = min(k * band_h, nty), min((k + 1) * band_h, nty)
        ntk = np.minimum(exact_tile_counts(
            means2d, radii, width, height, ts, conics=np.asarray(conics),
            opacities=np.asarray(opac), row_lo=lo, row_hi=hi), MAXT)
        clsk = np.searchsorted(caps, np.clip(ntk, 1, MAXT))
        hist = np.maximum(hist,
                          np.bincount(clsk[ntk > 0], minlength=len(caps))[:len(caps)])
    budgets = tuple(int(np.ceil(h * 1.05 / 128) * 128 + 128) for h in hist)
    hard_min = tuple(int(np.ceil(h / 128) * 128) for h in hist)
    return squeeze_budgets_under_pow2(budgets, hard_min, caps)


def run(name, bands=0, queue=True, direct=False, db=0):
    budgets = budgets_for(bands)
    n_slots = total_slots(N, MAXT, budgets) * max(bands, 1)
    nw, nd_k, gcap = jax.jit(
        lambda: rasterize_grad_meta(
            means2d, conics, colors, opac, depths, radii, width, height,
            tile_size=ts, chunk=chunk, max_tiles_per_gaussian=MAXT,
            class_budgets=budgets, sort_bands=bands, queue=queue,
            interpret=not on_tpu)
    )()
    grad_frac = min(1.0, max(float(int(nw) + int(nd_k)) * 1.08, chunk)
                    / float(int(gcap)))

    def fwd_bwd(s, m, c2, col, o, dd, r):
        def loss2(m, c2, col, o, dd):
            img, alpha, depth = rasterize_tiled(
                m * s, c2, col, o, dd, r, width, height,
                tile_size=ts, chunk=chunk, max_tiles_per_gaussian=MAXT,
                class_budgets=budgets, grad_buffer_frac=grad_frac,
                reduce_slices=4, sort_bands=bands, depth_bits=db,
                queue=queue, direct_dma=direct,
                interpret=not on_tpu, depth_grad=False)
            return jnp.sum(img) + jnp.sum(alpha)
        return jax.grad(loss2, argnums=(0, 1, 2, 3, 4))(m, c2, col, o, dd)

    dt = time_fn_device(fwd_bwd, (means2d, conics, colors, opac, depths,
                                  radii), reps=REPS)
    mpix = width * height / dt / 1e6
    print(f"{name:10s} bands={bands} queue={int(queue)} direct={int(direct)} "
          f"db={db}: {dt*1e3:7.1f} ms  {mpix:6.2f} Mpix/s  "
          f"(slots {n_slots}, grad_frac {grad_frac:.3f})", flush=True)
    return dt


CONFIGS = {
    "base":   dict(),
    "loop":   dict(queue=False),
    "bands2": dict(bands=2),
    "bands4": dict(bands=4),
    "bands8": dict(bands=8),
    "direct": dict(direct=True),
    "db16":   dict(db=16),
    "combo4l": dict(bands=4, queue=False),
    "loopdb16": dict(queue=False, db=16),
    "loopdirect": dict(queue=False, direct=True),
}

for name in WANT:
    run(name, **CONFIGS[name])
