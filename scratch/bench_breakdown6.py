"""Round-3 breakdown — current APIs (squeeze_budgets_under_pow2, sliced
reduce, frac'd grad buffer). On-device chained timing (time_fn_device).

Run: python scratch/bench_breakdown6.py [N]
"""

import sys

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from gaussian_splatting_tpu.utils.cache import enable_compile_cache

enable_compile_cache()

from gaussian_splatting_tpu.ops.tiling import (
    class_caps, exact_tile_counts, isect_and_sort, reduce_padded_grads,
    squeeze_budgets_under_pow2, total_slots, cdiv)
from gaussian_splatting_tpu.ops.rasterize_pallas import (
    rasterize_grad_meta, rasterize_tiled)
from gaussian_splatting_tpu.utils.profiling import time_fn_device

N = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
width, height = 1920, 1080
ts = 16
MAXT = 16
REPS = 6
SLICES = 4
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
BUD = tuple(int(np.ceil(h * 1.05 / 128) * 128 + 128) for h in hist)
hard_min = tuple(int(np.ceil(h / 128) * 128) for h in hist)
BUD = squeeze_budgets_under_pow2(BUD, hard_min, caps)
slots = total_slots(N, MAXT, BUD)

nw, nd_k, gcap = jax.jit(lambda: rasterize_grad_meta(
    means2d, conics, colors, opac, depths, radii, width, height,
    tile_size=ts, chunk=chunk, max_tiles_per_gaussian=MAXT,
    class_budgets=BUD, interpret=False))()
FRAC = min(1.0, max(float(int(nw) + int(nd_k)) * 1.08, chunk) / float(int(gcap)))
print(f"chunk {chunk}: slots {slots} n_written {int(nw)} frac {FRAC:.3f}",
      flush=True)


def t(name, fn, args, reps=REPS):
    dt = time_fn_device(fn, args, reps=reps)
    print(f"  {name}: {dt*1e3:.2f} ms", flush=True)
    return dt


t("null", lambda s: s + 1.0, ())

bin_args = (means2d, conics, colors, opac, depths, radii)
t_bin = t("bin+sort (2key)",
          lambda s, m, c2, col, o, dd, r: isect_and_sort(
              m * s, c2, col, o, dd, r, width, height, ts, chunk, MAXT,
              class_budgets=BUD).sorted_soa, bin_args)
t_enum = t("bin enum only (no final sort)",
           lambda s, m, c2, col, o, dd, r: isect_and_sort(
               m * s, c2, col, o, dd, r, width, height, ts, chunk, MAXT,
               class_budgets=BUD, _skip_final_sort=True).sorted_soa,
           bin_args)

pcap = int(np.ceil(int(gcap) * FRAC / chunk)) * chunk + chunk
pcap = cdiv(pcap, chunk * SLICES) * chunk * SLICES
gids = jnp.asarray(rng.integers(0, N + 1, size=(pcap,)).astype(np.float32))
gbuf = jnp.concatenate(
    [gids[None, :],
     jnp.asarray(rng.normal(size=(10, pcap)).astype(np.float32)),
     jnp.zeros((5, pcap), jnp.float32)], axis=0)
t_red = t(f"grad reduce (slices={SLICES}, no depth)",
          lambda s, gb: reduce_padded_grads(
              gb.at[1].mul(1.0 + (s - 1.0) * 1e-9), N, jnp.int32(pcap),
              with_depth=False, sort_slices=SLICES),
          (gbuf,))


def fwd(s, m, c2, col, o, dd, r):
    return rasterize_tiled(
        m * s, c2, col, o, dd, r, width, height,
        tile_size=ts, chunk=chunk, max_tiles_per_gaussian=MAXT,
        class_budgets=BUD, grad_buffer_frac=FRAC, reduce_slices=SLICES,
        interpret=False, depth_grad=False)


t_fwd = t("full fwd", lambda s, *a: fwd(s, *a)[0], bin_args)


def loss(s_, m, c2, col, o, dd, r):
    img, alpha, depth = fwd(s_, m, c2, col, o, dd, r)
    return jnp.sum(img) + jnp.sum(alpha)


t_all = t("full fwd+bwd",
          lambda s, *a: jax.grad(loss, argnums=(1, 2, 3, 4, 5))(s, *a),
          bin_args)
px = width * height
print(f"-> enum {t_enum*1e3:.0f} | sort {(t_bin-t_enum)*1e3:.0f} | "
      f"fwd kernel ~{(t_fwd-t_bin)*1e3:.0f} ms | "
      f"bwd-side ~{(t_all-t_fwd)*1e3:.0f} ms (incl reduce {t_red*1e3:.0f}) | "
      f"fwd {px/t_fwd/1e6:.2f} | fwd+bwd {px/t_all/1e6:.2f} Mpix/s",
      flush=True)
