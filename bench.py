"""Driver benchmark: pixels/sec/chip, forward+backward, through the full
Pallas rasterization path at the north-star config (1M gaussians @ 1080p,
BASELINE.json). Prints ONE JSON line:

  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

``vs_baseline`` is the ratio against a documented VPU roofline estimate for
this workload on one v5e chip (see ``_roofline_pixels_per_sec``) — the
reference publishes no numbers (BASELINE.md), so the roofline is the bar.

Smaller/faster knobs for local runs:
  python bench.py [n_gaussians] [width height]

Flag defaults are the measured-fastest full-path configuration (BENCH.md
round 5); override for A/B via env:
  GS_BENCH_BANDS  (sort_bands; band-split binning)
  GS_BENCH_QUEUE  (1 = flat chunk-queue kernels, 0 = loop kernels)
"""

import json
import os
import sys
import time

import numpy as np


def _roofline_pixels_per_sec(n_isect, n_pixels, tile_pixels=256):
    """Speed-of-light estimate for fwd+bwd splatting on one v5e chip.

    The inner loop is VPU-elementwise over (entries x tile_pixels) pairs:
    ~30 vector ops fwd + ~60 bwd per (entry, pixel) pair (alpha eval, scan,
    blend, gradient chain), at ~0.25 Tflop/s-equivalent f32 VPU elementwise
    throughput per v5e core (8x128 lanes x ~2 ops x 940 MHz), plus the MXU
    matmuls which overlap. HBM traffic is secondary (SoA streams at ~64B per
    entry). This yields pairs/sec ~= 2.4e12 / 90 ~= 2.7e10.
    """
    pair_ops = 90.0
    vpu_ops_per_sec = 1.9e12  # 8*128 lanes * 2 flops * 940 MHz
    pairs = float(n_isect) * tile_pixels
    t = pairs * pair_ops / vpu_ops_per_sec
    return n_pixels / t


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    width = int(sys.argv[2]) if len(sys.argv) > 3 else 1920
    height = int(sys.argv[3]) if len(sys.argv) > 3 else 1080

    import jax
    import jax.numpy as jnp

    from gaussian_splatting_tpu.utils.cache import enable_compile_cache

    enable_compile_cache()

    from gaussian_splatting_tpu.ops.rasterize_pallas import rasterize_tiled

    on_tpu = jax.default_backend() == "tpu"
    rng = np.random.default_rng(0)
    # Screen-space gaussians with a realistic radius distribution (mostly
    # small splats, a few large ones), uniform over the frame.
    means2d = jnp.asarray(rng.uniform([0, 0], [width, height], size=(n, 2)), jnp.float32)
    sx = rng.lognormal(mean=0.8, sigma=0.5, size=(n,)).clip(0.7, 12.0)
    sy = rng.lognormal(mean=0.8, sigma=0.5, size=(n,)).clip(0.7, 12.0)
    th = rng.uniform(0, np.pi, size=(n,))
    c, s = np.cos(th), np.sin(th)
    a = c * c * sx**2 + s * s * sy**2
    b = c * s * (sx**2 - sy**2)
    d = s * s * sx**2 + c * c * sy**2
    det = a * d - b * b
    conics = jnp.asarray(np.stack([d / det, -b / det, a / det], 1), jnp.float32)
    colors = jnp.asarray(rng.uniform(size=(n, 3)), jnp.float32)
    opac = jnp.asarray(rng.uniform(0.3, 0.9, size=(n,)), jnp.float32)
    depths = jnp.asarray(rng.uniform(1, 10, size=(n,)), jnp.float32)
    radii = jnp.asarray(np.ceil(3 * np.maximum(sx, sy)), jnp.int32)

    chunk = 256
    max_t = 16
    sort_bands = int(os.environ.get("GS_BENCH_BANDS", "0"))
    queue = bool(int(os.environ.get("GS_BENCH_QUEUE", "0")))

    # Compact footprint-class binning: measure the population's class
    # histogram (exactly what the trainer does at init) and budget with
    # small headroom — the big payload sort carries only ~pow2-rounded real
    # intersections instead of N*max_t slots. With sort_bands, budgets are
    # shared across bands and must cover the heaviest band.
    from gaussian_splatting_tpu.ops.tiling import (
        cdiv, class_caps, exact_tile_counts, squeeze_budgets_under_pow2,
        total_slots)

    caps = np.asarray(class_caps(max_t))
    nty = cdiv(height, 16)
    Kb = max(sort_bands, 1)
    band_h = cdiv(nty, Kb)
    hist = np.zeros(len(caps), np.int64)
    for k in range(Kb):
        lo, hi = min(k * band_h, nty), min((k + 1) * band_h, nty)
        ntk = np.minimum(exact_tile_counts(
            means2d, radii, width, height, 16,
            conics=np.asarray(conics), opacities=np.asarray(opac),
            row_lo=lo, row_hi=hi), max_t)
        clsk = np.searchsorted(caps, np.clip(ntk, 1, max_t))
        hist = np.maximum(
            hist, np.bincount(clsk[ntk > 0], minlength=len(caps))[:len(caps)])
    budgets = tuple(int(np.ceil(h * 1.05 / 128) * 128 + 128) for h in hist)
    hard_min = tuple(int(np.ceil(h / 128) * 128) for h in hist)
    budgets = squeeze_budgets_under_pow2(budgets, hard_min, caps)

    args = (means2d, conics, colors, opac, depths)

    stats = jax.jit(
        lambda: rasterize_tiled(
            means2d, conics, colors, opac, depths, radii, width, height,
            tile_size=16, chunk=chunk, max_tiles_per_gaussian=max_t,
            class_budgets=budgets, sort_bands=sort_bands, queue=queue,
            interpret=not on_tpu, with_stats=True,
        )[3]
    )()
    n_isect = int(stats["n_isect"])
    n_dropped = int(stats["n_dropped"])
    n_budget_dropped = int(stats["n_budget_dropped"])
    n_slots = total_slots(n, max_t, budgets) * Kb

    # Size the gradient buffer to the measured backward occupancy (+8%):
    # the gid sort over this buffer scales with its static length, and the
    # compact appends typically fill well under the n_slots bound. This is
    # exactly what the trainer's grad-buffer hysteresis converges to.
    from gaussian_splatting_tpu.ops.rasterize_pallas import rasterize_grad_meta

    nw, nd_k, gcap = jax.jit(
        lambda: rasterize_grad_meta(
            means2d, conics, colors, opac, depths, radii, width, height,
            tile_size=16, chunk=chunk, max_tiles_per_gaussian=max_t,
            class_budgets=budgets, sort_bands=sort_bands, queue=queue,
            interpret=not on_tpu,
        )
    )()
    grad_frac = min(1.0, max(float(int(nw) + int(nd_k)) * 1.08, chunk)
                    / float(int(gcap)))
    reduce_slices = 4

    # Honest timing: reps run inside ONE on-device fori_loop chained through
    # a carry (time_fn_device) — the remote execution layer can neither
    # overlap reps across its worker pool nor memoize them (round-1 numbers
    # used independent perturbed calls and were unreliable; see BENCH.md).
    from gaussian_splatting_tpu.utils.profiling import time_fn_device

    def fwd_bwd(s, m, c2, col, o, dd, r):
        # The measured workload is RGB training: a photometric loss over the
        # color+alpha outputs, no depth cotangent — matching the reference's
        # gsplat RGB mode, whose CUDA backward computes no depth gradients
        # either (render_mode="RGB", gsplat_backend.py:168-182).
        # depth_grad=False lets the backward reduce drop the (all-zero)
        # ddepth sort payload, exactly like the training step does.
        def loss2(m, c2, col, o, dd):
            img, alpha, depth = rasterize_tiled(
                m * s, c2, col, o, dd, r, width, height,
                tile_size=16, chunk=chunk,
                max_tiles_per_gaussian=max_t, class_budgets=budgets,
                grad_buffer_frac=grad_frac, reduce_slices=reduce_slices,
                sort_bands=sort_bands, queue=queue,
                interpret=not on_tpu, depth_grad=False,
            )
            return jnp.sum(img) + jnp.sum(alpha)
        return jax.grad(loss2, argnums=(0, 1, 2, 3, 4))(m, c2, col, o, dd)

    dt = time_fn_device(fwd_bwd, args + (radii,), reps=6)

    pixels = width * height
    value = pixels / dt
    roof = _roofline_pixels_per_sec(n_isect, pixels)
    print(json.dumps({
        "metric": f"pixels_per_sec_chip_fwd_bwd_{n//1000}k_gaussians_{width}x{height}",
        "value": round(value, 1),
        "unit": "pixels/s",
        "vs_baseline": round(value / roof, 4),
        "n_isect": n_isect,
        "n_tile_overflow_dropped": n_dropped,
        "n_budget_dropped": n_budget_dropped,
        "n_grad_written": int(nw),
        "n_grad_dropped_kernel": int(nd_k),
        "grad_buffer_frac": round(grad_frac, 4),
        "n_sort_slots": n_slots,
    }))


if __name__ == "__main__":
    main()
