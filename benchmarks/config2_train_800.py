"""BASELINE.json config 2: 100k gaussians, 800x800 Blender-style scene,
8 synthetic cameras, full training loop, no densification.

Measures steps/sec and PSNR trajectory of the jitted train step on real
hardware. Run: python benchmarks/config2_train_800.py [iters] [--bf16]

``--bf16`` runs the L1/SSIM image math in bfloat16 (config.loss_dtype,
the AMP-analog experiment — reference trains under torch autocast,
trainer.py:31,468); the kernels stay f32 by design.
"""

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), '..'))
import time

import numpy as np


def main():
    args = [a for a in sys.argv[1:] if a != "--bf16"]
    bf16 = "--bf16" in sys.argv
    iters = int(args[0]) if args else 200

    import jax
    import jax.numpy as jnp

    from gaussian_splatting_tpu.utils.cache import enable_compile_cache

    enable_compile_cache()

    from gaussian_splatting_tpu.core.cameras import look_at, make_intrinsics
    from gaussian_splatting_tpu.core.sh import rgb_to_sh0
    from gaussian_splatting_tpu.models.gaussians import init_from_points
    from gaussian_splatting_tpu.ops.render import render
    from gaussian_splatting_tpu.training.config import TrainingConfig
    from gaussian_splatting_tpu.training.optimizer import adam_init
    from gaussian_splatting_tpu.training.step import TrainState, ViewBatch, make_train_step

    width = height = 800
    n_gauss = 100_000
    n_views = 8
    backend = "pallas" if jax.default_backend() == "tpu" else "ref"
    rng = np.random.default_rng(0)

    # Ground-truth scene: colored cloud in a ball, rendered by the same
    # renderer (self-consistency benchmark — measures optimization + kernels).
    pts = rng.normal(size=(n_gauss, 3)).astype(np.float32)
    pts /= np.maximum(np.linalg.norm(pts, axis=1, keepdims=True) / 1.2, 1.0)
    gt_state = init_from_points(pts, rng.uniform(0.05, 0.95, (n_gauss, 3)), n_gauss,
                                capacity=n_gauss, init_opacity=0.85)
    K = make_intrinsics(width, height, focal_px=960.0)
    cams = []
    for i in range(n_views):
        a = 2 * np.pi * i / n_views
        cams.append(np.asarray(look_at((3.5 * np.sin(a), 0.6, -3.5 * np.cos(a)),
                                       (0, 0, 0))))
    gt = gt_state.params
    masked = gt.masked_opacities(gt_state.alive)

    @jax.jit
    def render_gt(viewmat):
        return jnp.clip(render(
            gt.means, gt.quats, gt.log_scales, masked, gt.sh_coeffs,
            viewmat, K, width, height, sh_degree=0, backend=backend,
        ).render, 0, 1)

    print("rendering ground truth views...", file=sys.stderr)
    images = np.stack([np.asarray(render_gt(jnp.asarray(c))) for c in cams])

    cfg = TrainingConfig(batch_size=4, backend=backend,
                         loss_dtype="bfloat16" if bf16 else "float32")
    state0 = init_from_points(
        pts + rng.normal(size=pts.shape).astype(np.float32) * 0.02,
        rng.uniform(0.05, 0.95, (n_gauss, 3)), n_gauss, capacity=n_gauss)
    ts = TrainState(gauss=state0, opt=adam_init(state0.params),
                    iteration=jnp.zeros((), jnp.int32))
    step = make_train_step(cfg, width, height, 0, backend, 2.4, donate=True)

    batch_rng = np.random.default_rng(1)
    d_imgs = jnp.asarray(images)
    d_cams = jnp.asarray(np.stack(cams).astype(np.float32))
    d_K = jnp.tile(jnp.asarray(K)[None], (n_views, 1, 1))

    @jax.jit
    def gather(idx):
        return ViewBatch(images=d_imgs[idx], viewmats=d_cams[idx], Ks=d_K[idx])

    # Warmup/compile
    ts, m = step(ts, gather(jnp.asarray([0, 1, 2, 3], jnp.int32)))
    jax.block_until_ready(m["loss"])
    print(f"compiled; initial loss {float(m['loss']):.4f}", file=sys.stderr)

    t0 = time.time()
    psnr0 = float(m["psnr"])
    for i in range(iters):
        idx = jnp.asarray(batch_rng.choice(n_views, 4), jnp.int32)
        ts, m = step(ts, gather(idx))
    jax.block_until_ready(m["loss"])
    dt = time.time() - t0
    print(json.dumps({
        "metric": "config2_steps_per_sec_100k_800px_batch4",
        "value": round(iters / dt, 3),
        "unit": "steps/s",
        "psnr_start": round(psnr0, 2),
        "psnr_end": round(float(m["psnr"]), 2),
        "iters": iters,
        "loss_dtype": cfg.loss_dtype,
    }))


if __name__ == "__main__":
    main()
