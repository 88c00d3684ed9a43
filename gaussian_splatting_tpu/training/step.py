"""The jitted training step — the whole optimization inner loop as one XLA
computation (renders of a view batch, loss, backward through the Pallas
kernels, Adam update, gradient-norm accumulation, scale clamp).

Replaces the reference's per-step Python orchestration
(``trainer.py:447-521`` + ``:786-791`` + ``:852-859``) with a single
``jax.jit`` whose buffers are donated — zero host round-trips per step.
"""

import dataclasses
from typing import NamedTuple

import jax
import jax.numpy as jnp

from gaussian_splatting_tpu.models.gaussians import GaussianState
from gaussian_splatting_tpu.ops.render import render
from gaussian_splatting_tpu.training.loss import photometric_loss, scale_ratio_reg
from gaussian_splatting_tpu.training.optimizer import (
    AdamState,
    adam_update,
    group_lrs,
    xyz_lr_schedule,
)


class TrainState(NamedTuple):
    gauss: GaussianState
    opt: AdamState
    iteration: jnp.ndarray  # () int32


class ViewBatch(NamedTuple):
    """A batch of training views. Static image size per compile."""

    images: jnp.ndarray    # (B, H, W, 3) f32 in [0, 1]
    viewmats: jnp.ndarray  # (B, 4, 4) world-to-camera
    Ks: jnp.ndarray        # (B, 3, 3)


def make_train_step(
    config,
    width: int,
    height: int,
    sh_degree: int,
    backend: str,
    isect_capacity: int,
    scene_extent: float,
    donate: bool = True,
):
    """Build the jitted train step for one (image size, sh_degree, capacity)
    configuration. The SH warmup schedule re-invokes this with a higher
    degree every ``sh_increment_interval`` iterations (a handful of cached
    recompiles, matching the reference's warmup intent of not evaluating
    inactive SH bands at all — reference ``trainer.py:77-87``)."""

    def step(state: TrainState, batch: ViewBatch):
        B = batch.images.shape[0]
        alive = state.gauss.alive

        def loss_fn(params):
            sh = params.sh_coeffs
            masked_op = params.masked_opacities(alive)

            # lax.scan over the view batch: ONE compiled render body instead
            # of B unrolled copies — same runtime (renders are sequential
            # anyway), ~B-times faster XLA compiles.
            # Overflow counters (VERDICT round-1: tile-cap drops were
            # invisible during training) — summed over the view batch and
            # logged every step.
            want_stats = backend == "pallas"
            stat_keys = ("n_isect", "n_dropped", "n_budget_dropped",
                         "n_grad_dropped") if want_stats else ()

            def render_one(carry, view):
                total, m_acc, radii_max, s_acc = carry
                image, viewmat, K = view
                out = render(
                    params.means, params.quats, params.log_scales, masked_op,
                    sh, viewmat, K, width, height,
                    sh_degree=sh_degree, backend=backend,
                    tile_size=config.tile_size,
                    isect_capacity=isect_capacity,
                    max_tiles_per_gaussian=config.max_tiles_per_gaussian,
                    raster_chunk=config.raster_chunk,
                    class_budgets=config.class_budgets,
                    depth_bits=config.sort_depth_bits,
                    grad_buffer_frac=config.grad_buffer_frac,
                    rasterize_mode=config.rasterize_mode,
                    with_stats=want_stats,
                )
                radii_max = jnp.maximum(radii_max, jax.lax.stop_gradient(out.radii))
                l, m = photometric_loss(out.render, image, config.lambda_dssim)
                m_acc = {k: m_acc[k] + m[k] for k in m_acc}
                if want_stats:
                    s_acc = {k: s_acc[k] + out.stats[k] for k in stat_keys}
                return (total + l, m_acc, radii_max, s_acc), None

            init = (
                jnp.float32(0.0),
                {"l1": jnp.float32(0.0), "ssim": jnp.float32(0.0), "psnr": jnp.float32(0.0)},
                jnp.zeros_like(state.gauss.max_radii2d),
                {k: jnp.int32(0) for k in stat_keys},
            )
            (total, m_acc, radii_max, s_acc), _ = jax.lax.scan(
                render_one, init, (batch.images, batch.viewmats, batch.Ks)
            )
            total = total / B
            reg = scale_ratio_reg(
                params.log_scales, alive,
                config.scale_reg_max_ratio, config.scale_reg_weight,
            )
            total = total + reg
            metrics = {k: v / B for k, v in m_acc.items()}
            metrics["scale_reg"] = reg
            metrics.update({f"stats/{k}": v for k, v in s_acc.items()})
            return total, (metrics, radii_max)

        (loss, (metrics, radii_max)), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.gauss.params
        )

        # Per-group Adam with the exponentially decayed xyz LR.
        xyz_lr = xyz_lr_schedule(config, state.iteration)
        lrs = group_lrs(config, xyz_lr)
        new_params, new_opt = adam_update(
            grads, state.opt, state.gauss.params, lrs,
            b1=config.adam_b1, b2=config.adam_b2, eps=config.adam_eps,
        )

        # Per-step scale ceiling (reference ``trainer.py:856-859``).
        ceiling = jnp.log(jnp.float32(scene_extent) * config.scale_clamp_ratio + 1e-9)
        new_params = dataclasses.replace(
            new_params, log_scales=jnp.minimum(new_params.log_scales, ceiling)
        )

        # Densify bookkeeping: accumulate ||grad_xyz|| broadcast into all 3
        # accumulator columns and count += 1 for every gaussian — faithfully
        # reproducing the reference quirk (``trainer.py:786-791``) the
        # densify threshold was tuned against.
        gnorm = jnp.linalg.norm(grads.means, axis=-1, keepdims=True)  # (C, 1)
        gauss = dataclasses.replace(
            state.gauss,
            params=new_params,
            xyz_grad_accum=state.gauss.xyz_grad_accum + gnorm,
            xyz_grad_count=state.gauss.xyz_grad_count + 1.0,
            max_radii2d=jnp.maximum(state.gauss.max_radii2d, radii_max),
        )

        new_state = TrainState(
            gauss=gauss, opt=new_opt, iteration=state.iteration + 1
        )
        # Per-group gradient norms (reference logs these every scalar
        # interval, ``trainer.py:889-898``).
        gn = {
            f"grad_norm/{k}": jnp.linalg.norm(getattr(grads, k))
            for k in ("means", "quats", "log_scales", "logit_opacities",
                      "features_dc", "features_rest")
        }
        metrics = dict(metrics, loss=loss, xyz_lr=xyz_lr, **gn)
        return new_state, metrics

    donate_args = (0,) if donate else ()
    return jax.jit(step, donate_argnums=donate_args)
