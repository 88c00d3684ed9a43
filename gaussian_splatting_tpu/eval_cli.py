"""Eval CLI — counterpart of the reference ``python -m src.eval``
(``eval.py:94-253``): load a checkpoint (ours ``.npz``, a reference-style
``.pth``, or a ``.ply``), render N evenly-spaced views against ground-truth
frames, report L1/SSIM/PSNR, save side-by-side PNGs, and re-export a PLY.

Usage:
  python -m gaussian_splatting_tpu.eval_cli --model final.npz \
      --videos input.mp4 [--num-views 12] [--output eval_out]
"""

import argparse
import json
import logging
import sys
from pathlib import Path

import numpy as np

log = logging.getLogger(__name__)


def load_model(path: str):
    from gaussian_splatting_tpu.training.checkpoint import (
        load_checkpoint,
        load_reference_pth,
    )

    if path.endswith(".npz"):
        state, meta = load_checkpoint(path)
        if state.poses is not None:
            meta = dict(meta)
            meta["pose_deltas"] = np.asarray(state.poses.deltas)
        return state.gauss, meta
    if path.endswith(".pth"):
        return load_reference_pth(path), {}
    if path.endswith(".ply"):
        import dataclasses

        import jax.numpy as jnp

        from gaussian_splatting_tpu.models.gaussians import empty_state
        from gaussian_splatting_tpu.training.export import read_ply

        d = read_ply(path)
        n = len(d["means"])
        st = empty_state(max(n, 1))
        params = dataclasses.replace(
            st.params,
            means=jnp.asarray(d["means"]),
            quats=jnp.asarray(d["quats"]),
            log_scales=jnp.asarray(d["log_scales"]),
            logit_opacities=jnp.asarray(d["logit_opacities"]),
            features_dc=jnp.asarray(d["features_dc"]),
            features_rest=jnp.asarray(d["features_rest"]),
        )
        return dataclasses.replace(st, params=params,
                                   alive=jnp.ones((n,), bool)), {}
    raise ValueError(f"unknown model format: {path}")


def main(argv=None) -> int:
    logging.basicConfig(level=logging.INFO)
    p = argparse.ArgumentParser()
    p.add_argument("--model", required=True, help=".npz / .pth / .ply checkpoint")
    p.add_argument("--videos", nargs="+", required=True)
    p.add_argument("--output", default="./eval_out")
    p.add_argument("--num-views", type=int, default=12)
    p.add_argument("--frame-stride", type=int, default=30)
    p.add_argument("--matcher", default="sift")
    p.add_argument("--use-sfm-cache", action="store_true", default=True)
    p.add_argument("--backend", choices=["auto", "pallas", "ref"], default="auto")
    p.add_argument("--cache-dir", default="./cache")
    p.add_argument("--pose-align", type=int, default=0, metavar="STEPS",
                   help="test-time pose alignment: optimize one se(3) delta "
                        "per evaluated view (gaussians frozen) for STEPS Adam "
                        "steps before scoring — the BARF/CamP eval protocol "
                        "for models whose train poses were refined; reports "
                        "psnr_aligned next to the raw psnr")
    p.add_argument("--pose-align-lr", type=float, default=3e-3)
    args = p.parse_args(argv)

    from gaussian_splatting_tpu.utils.cache import enable_compile_cache

    enable_compile_cache()

    import jax
    import jax.numpy as jnp
    from PIL import Image

    from gaussian_splatting_tpu.ops.render import render
    from gaussian_splatting_tpu.train_cli import build_dataset
    from gaussian_splatting_tpu.training.export import export_state_ply
    from gaussian_splatting_tpu.training.loss import psnr as psnr_fn
    from gaussian_splatting_tpu.training.loss import ssim as ssim_fn
    from gaussian_splatting_tpu.video.processor import MultiVideoProcessor

    out = Path(args.output)
    out.mkdir(parents=True, exist_ok=True)
    gauss, meta = load_model(args.model)
    n_exported = export_state_ply(gauss, str(out / "model.ply"))
    log.info("model: %d gaussians", n_exported)

    proc = MultiVideoProcessor(matcher=args.matcher, cache_dir=args.cache_dir)
    merged = proc.process_videos(args.videos, stride=args.frame_stride,
                                 use_cache=args.use_sfm_cache)
    ds = build_dataset(merged)
    V = ds.num_views
    sel = np.unique(np.linspace(0, V - 1, min(args.num_views, V)).astype(int))

    backend = args.backend
    if backend == "auto":
        backend = "pallas" if jax.default_backend() == "tpu" else "ref"
    width, height = ds.width, ds.height
    params = gauss.params
    masked_op = params.masked_opacities(gauss.alive)

    # Render with the training run's raster settings from the checkpoint
    # meta (tile cap, chunk, class budgets, SH degree) — a model trained
    # with an adaptive 256-tile cap must not be re-truncated to the default
    # 16 at eval time.
    rmeta = meta.get("render", {}) if isinstance(meta, dict) else {}
    tile_size = int(rmeta.get("tile_size", 16))
    raster_chunk = int(rmeta.get("raster_chunk", 256))
    max_tiles = int(rmeta.get("max_tiles_per_gaussian", 16))
    sh_degree = int(rmeta.get("sh_degree_max", 3))
    rasterize_mode = str(rmeta.get("rasterize_mode", "classic"))
    sort_buckets = int(rmeta.get("sort_buckets", 0))
    reduce_slices = int(rmeta.get("reduce_slices", 0))
    bucket_headroom = float(rmeta.get("partition_headroom", 1.5))
    budgets = rmeta.get("class_budgets")
    budgets = tuple(int(b) for b in budgets) if budgets else None
    if rmeta:
        log.info("render settings from checkpoint meta: tile=%d chunk=%d "
                 "max_tiles=%d sh=%d budgets=%s",
                 tile_size, raster_chunk, max_tiles, sh_degree, budgets)

    @jax.jit
    def render_view(viewmat, K):
        o = render(params.means, params.quats, params.log_scales, masked_op,
                   params.sh_coeffs, viewmat, K, width, height,
                   sh_degree=sh_degree, backend=backend,
                   tile_size=tile_size, raster_chunk=raster_chunk,
                   max_tiles_per_gaussian=max_tiles, class_budgets=budgets,
                   sort_buckets=sort_buckets, bucket_headroom=bucket_headroom,
                   reduce_slices=reduce_slices,
                   rasterize_mode=rasterize_mode)
        return jnp.clip(o.render, 0.0, 1.0)

    # A model trained with --optimize-poses lives in its refined-pose gauge:
    # apply the checkpointed per-view deltas when this dataset is the same
    # one it trained on (same SfM cache -> same view count/order).
    viewmats = np.asarray(ds.viewmats)
    deltas = meta.get("pose_deltas") if isinstance(meta, dict) else None
    if deltas is not None and len(deltas) == V:
        from gaussian_splatting_tpu.core.se3 import se3_exp

        viewmats = np.asarray(se3_exp(jnp.asarray(deltas))) @ viewmats
        log.info("applied %d checkpointed train-pose deltas "
                 "(max |delta| %.2e)", V, float(np.abs(deltas).max()))
    elif deltas is not None:
        log.warning("checkpoint has %d pose deltas but dataset has %d views "
                    "— not applied", len(deltas), V)

    align_view = None
    if args.pose_align > 0:
        from gaussian_splatting_tpu.core.se3 import apply_pose_delta

        b1, b2, eps = 0.9, 0.999, 1e-8
        lr, n_steps = args.pose_align_lr, args.pose_align

        @jax.jit
        def align_view(viewmat, K, gt):
            # MSE objective (what PSNR scores) + best-visited tracking: an
            # unguarded Adam loop random-walks on weak gradients and can
            # end WORSE than the identity; returning the best visited delta
            # (xi = 0 is evaluated first) makes alignment no-harm.
            def loss(xi):
                o = render(params.means, params.quats, params.log_scales,
                           masked_op, params.sh_coeffs,
                           apply_pose_delta(viewmat, xi), K, width, height,
                           sh_degree=sh_degree, backend=backend,
                           tile_size=tile_size, raster_chunk=raster_chunk,
                           max_tiles_per_gaussian=max_tiles,
                           class_budgets=budgets,
                           sort_buckets=sort_buckets,
                           bucket_headroom=bucket_headroom,
                           reduce_slices=reduce_slices,
                           rasterize_mode=rasterize_mode)
                d = jnp.clip(o.render, 0, 1) - gt
                return jnp.mean(d * d)

            def body(t, carry):
                xi, mu, nu, best_xi, best_l = carry
                l, g = jax.value_and_grad(loss)(xi)
                better = l < best_l
                best_xi = jnp.where(better, xi, best_xi)
                best_l = jnp.where(better, l, best_l)
                tf = t.astype(jnp.float32) + 1.0
                mu = b1 * mu + (1.0 - b1) * g
                nu = b2 * nu + (1.0 - b2) * g * g
                xi = xi - lr * (mu / (1.0 - b1 ** tf)) / (
                    jnp.sqrt(nu / (1.0 - b2 ** tf)) + eps)
                return xi, mu, nu, best_xi, best_l

            z = jnp.zeros((6,), jnp.float32)
            init = (z, z, z, z, jnp.float32(jnp.inf))
            *_, best_xi, _ = jax.lax.fori_loop(0, n_steps, body, init)
            return apply_pose_delta(viewmat, best_xi)

    rows = []
    for i in sel:
        gt = jnp.asarray(ds.images[i], jnp.float32) / 255.0
        vm = jnp.asarray(viewmats[i])
        K = jnp.asarray(ds.Ks[i])
        img = render_view(vm, K)
        m = {
            "view": int(i),
            "l1": float(jnp.mean(jnp.abs(img - gt))),
            "ssim": float(ssim_fn(img, gt)),
            "psnr": float(psnr_fn(img, gt)),
        }
        if align_view is not None:
            img = render_view(align_view(vm, K, gt), K)
            m["psnr_aligned"] = float(psnr_fn(img, gt))
        rows.append(m)
        side = np.concatenate([np.asarray(img), np.asarray(gt)], axis=1)
        Image.fromarray((side * 255).astype(np.uint8)).save(
            out / f"view_{int(i):04d}.png")
        log.info("view %d: L1 %.4f SSIM %.4f PSNR %.2f", i, m["l1"], m["ssim"], m["psnr"])

    summary = {
        "num_views": len(rows),
        "l1": float(np.mean([r["l1"] for r in rows])),
        "ssim": float(np.mean([r["ssim"] for r in rows])),
        "psnr": float(np.mean([r["psnr"] for r in rows])),
        "per_view": rows,
    }
    if rows and "psnr_aligned" in rows[0]:
        summary["psnr_aligned"] = float(
            np.mean([r["psnr_aligned"] for r in rows]))
    with open(out / "metrics.json", "w") as f:
        json.dump(summary, f, indent=2)
    print(json.dumps({k: summary[k] for k in summary if k != "per_view"}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
