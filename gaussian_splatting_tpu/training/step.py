"""The jitted training step — the whole optimization inner loop as one XLA
computation (renders of a view batch, loss, backward through the Pallas
kernels, Adam update, gradient-norm accumulation, scale clamp).

Replaces the reference's per-step Python orchestration
(``trainer.py:447-521`` + ``:786-791`` + ``:852-859``) with a single
``jax.jit`` whose buffers are donated — zero host round-trips per step.
"""

import dataclasses
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from gaussian_splatting_tpu.core.se3 import apply_pose_delta
from gaussian_splatting_tpu.models.gaussians import GaussianState
from gaussian_splatting_tpu.ops.render import render
from gaussian_splatting_tpu.training.loss import photometric_loss, scale_ratio_reg
from gaussian_splatting_tpu.training.optimizer import (
    AdamState,
    adam_update,
    group_lrs,
    xyz_lr_schedule,
)


class PoseState(NamedTuple):
    """Per-view se(3) pose corrections + their Adam moments (camera pose
    refinement — a capability the reference lacks: its SfM poses are frozen,
    reference trainer call stack §3.3). Row v corrects view v's world-to-
    camera by left multiplication (core/se3.py). Held-out validation views
    never appear in a train batch, so their rows stay exactly zero."""

    deltas: jnp.ndarray  # (V, 6) se(3) = (omega, upsilon)
    mu: jnp.ndarray      # (V, 6) Adam first moment
    nu: jnp.ndarray      # (V, 6) Adam second moment


def pose_state_init(n_views: int) -> PoseState:
    # Three DISTINCT buffers: the jitted step donates its input state, and
    # donating one underlying buffer for several parameters is an
    # InvalidArgument on TPU.
    return PoseState(deltas=jnp.zeros((n_views, 6), jnp.float32),
                     mu=jnp.zeros((n_views, 6), jnp.float32),
                     nu=jnp.zeros((n_views, 6), jnp.float32))


class TrainState(NamedTuple):
    gauss: GaussianState
    opt: AdamState
    iteration: jnp.ndarray  # () int32
    poses: Optional[PoseState] = None


class ViewBatch(NamedTuple):
    """A batch of training views. Static image size per compile."""

    images: jnp.ndarray    # (B, H, W, 3) f32 in [0, 1]
    viewmats: jnp.ndarray  # (B, 4, 4) world-to-camera
    Ks: jnp.ndarray        # (B, 3, 3)
    view_idx: Optional[jnp.ndarray] = None  # (B,) int32 dataset view ids


def pose_lr_schedule(config, iteration) -> jnp.ndarray:
    """Exponential decay pose_lr_init -> pose_lr_final over
    position_lr_max_steps (the xyz schedule's shape), gated to zero before
    pose_start_iter so the gaussians settle onto the SfM init first."""
    progress = jnp.minimum(
        iteration.astype(jnp.float32) / float(config.position_lr_max_steps), 1.0
    )
    lr = jnp.float32(config.pose_lr_init) * (
        config.pose_lr_final / config.pose_lr_init
    ) ** progress
    return jnp.where(iteration >= config.pose_start_iter, lr, 0.0)


def make_train_step(
    config,
    width: int,
    height: int,
    sh_degree: int,
    backend: str,
    scene_extent: float,
    donate: bool = True,
):
    """Build the jitted train step for one (image size, sh_degree, capacity)
    configuration. The SH warmup schedule re-invokes this with a higher
    degree every ``sh_increment_interval`` iterations (a handful of cached
    recompiles, matching the reference's warmup intent of not evaluating
    inactive SH bands at all — reference ``trainer.py:77-87``)."""

    optimize_poses = bool(getattr(config, "optimize_poses", False))

    def step(state: TrainState, batch: ViewBatch):
        B = batch.images.shape[0]
        alive = state.gauss.alive
        pose_on = (optimize_poses and state.poses is not None
                   and batch.view_idx is not None)

        def loss_fn(params, deltas):
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
                if pose_on:
                    image, viewmat, K, vidx = view
                    viewmat = apply_pose_delta(viewmat, deltas[vidx])
                else:
                    image, viewmat, K = view
                out = render(
                    params.means, params.quats, params.log_scales, masked_op,
                    sh, viewmat, K, width, height,
                    sh_degree=sh_degree, backend=backend,
                    tile_size=config.tile_size,
                    max_tiles_per_gaussian=config.max_tiles_per_gaussian,
                    raster_chunk=config.raster_chunk,
                    class_budgets=config.class_budgets,
                    depth_bits=config.sort_depth_bits,
                    grad_buffer_frac=config.grad_buffer_frac,
                    sort_buckets=config.sort_buckets,
                    bucket_headroom=config.partition_headroom,
                    reduce_slices=config.reduce_slices,
                    sort_bands=getattr(config, "sort_bands", 0),
                    rasterize_mode=config.rasterize_mode,
                    with_stats=want_stats,
                    # The training loss is photometric (L1 + DSSIM on RGB):
                    # the depth channel never gets a cotangent, so the
                    # backward reduce can drop its sort payload.
                    depth_grad=False,
                )
                radii_max = jnp.maximum(radii_max, jax.lax.stop_gradient(out.radii))
                l, m = photometric_loss(out.render, image, config.lambda_dssim,
                                        dtype=getattr(config, "loss_dtype",
                                                      "float32"))
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
            xs = (batch.images, batch.viewmats, batch.Ks)
            if pose_on:
                xs = xs + (batch.view_idx,)
            (total, m_acc, radii_max, s_acc), _ = jax.lax.scan(
                render_one, init, xs
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

        deltas_in = (state.poses.deltas if pose_on
                     else jnp.zeros((1, 6), jnp.float32))
        (loss, (metrics, radii_max)), (grads, grads_pose) = jax.value_and_grad(
            loss_fn, argnums=(0, 1), has_aux=True
        )(state.gauss.params, deltas_in)

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

        # Pose refinement: per-view se(3) Adam on the batch's views (same
        # torch-parity Adam form as the gaussian groups; the schedule gate
        # zeroes both the gradient and the lr before pose_start_iter so the
        # moments stay untouched until refinement begins).
        new_poses = state.poses
        if pose_on:
            plr = pose_lr_schedule(config, state.iteration)
            gp = jnp.where(plr > 0.0, grads_pose, 0.0)
            t = new_opt.step.astype(jnp.float32)
            c1 = 1.0 - config.adam_b1 ** t
            c2 = 1.0 - config.adam_b2 ** t
            mu = config.adam_b1 * state.poses.mu + (1.0 - config.adam_b1) * gp
            nu = config.adam_b2 * state.poses.nu + (1.0 - config.adam_b2) * gp * gp
            deltas = state.poses.deltas - plr * (mu / c1) / (
                jnp.sqrt(nu / c2) + config.adam_eps)
            new_poses = PoseState(deltas=deltas, mu=mu, nu=nu)
            metrics["pose_lr"] = plr
            metrics["grad_norm/poses"] = jnp.linalg.norm(grads_pose)
            metrics["pose/delta_max"] = jnp.max(jnp.abs(deltas))

        new_state = TrainState(
            gauss=gauss, opt=new_opt, iteration=state.iteration + 1,
            poses=new_poses,
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
