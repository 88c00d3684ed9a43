"""Sharded training step via ``shard_map`` over a ("data", "model") mesh,
with ZeRO-style gaussian-sharded parameters and optimizer state.

Per step, on each chip (d, m):
1. TP-analog: parameters, Adam moments, and densify accumulators are
   SHARDED over the ``model`` axis (each chip holds C/M gaussians — per-chip
   state memory is 1/M of replicated, which is what makes the 10M-gaussian
   config trainable). The chip projects + SH-decodes only its shard, then
   ``all_gather``s the compact screen-space tensors (10 floats/gaussian vs
   59 parameter floats) over ``model`` — ICI traffic scales with the
   *screen* representation, not the parameter state.
2. SP-analog: rasterize the chip's horizontal tile band (height/M rows,
   shifted viewport) of its local views (batch/D) against all gaussians.
3. Photometric loss masked to valid rows; SSIM is EXACT at band boundaries
   via a 1-row halo exchange (``ppermute`` over ``model`` — unpaired edges
   receive zeros, which is precisely the global zero-padding semantics);
   ``psum`` over both axes.
4. Backward retraces the same path: XLA inserts ``psum_scatter`` for the
   all_gather transpose (per-gaussian gradients come back already sharded)
   and ``psum`` over ``data`` — the Adam update then runs shard-local.
"""

import dataclasses

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import PartitionSpec as P

from gaussian_splatting_tpu.core.activations import opacity_activation, scale_activation
from gaussian_splatting_tpu.core.quaternions import quat_normalize
from gaussian_splatting_tpu.core.se3 import apply_pose_delta
from gaussian_splatting_tpu.core.sh import sh_to_color
from gaussian_splatting_tpu.ops.projection import project_gaussians
from gaussian_splatting_tpu.ops.rasterize_ref import rasterize_reference
from gaussian_splatting_tpu.ops.tiling import cdiv
from gaussian_splatting_tpu.training.loss import _avg_pool3, scale_ratio_reg, stclamp
from gaussian_splatting_tpu.training.optimizer import (
    adam_update,
    group_lrs,
    xyz_lr_schedule,
)
from gaussian_splatting_tpu.training.step import (
    PoseState,
    TrainState,
    ViewBatch,
    pose_lr_schedule,
)


def _halo_extend_rows(img, axis_name):
    """Prepend/append one row exchanged with the neighbor bands along
    ``axis_name`` (``ppermute``; edge bands receive zeros — exactly the
    global SSIM's zero-padding semantics)."""
    M = jax.lax.axis_size(axis_name)
    if M == 1:
        z = jnp.zeros_like(img[:1])
        return jnp.concatenate([z, img, z], axis=0)
    top_halo = jax.lax.ppermute(
        img[-1:], axis_name, [(m, m + 1) for m in range(M - 1)])
    bot_halo = jax.lax.ppermute(
        img[:1], axis_name, [(m, m - 1) for m in range(1, M)])
    return jnp.concatenate([top_halo, img, bot_halo], axis=0)


def _masked_ssim_sum(img1, img2, mask, axis_name=None):
    """Sum (not mean) of the SSIM map over masked pixels, so bands combine
    into a global mean by dividing by the total valid-pixel count. With
    ``axis_name``, a 1-row halo exchange makes the 3x3 windows exact at band
    boundaries (round-1 approximated them with zero padding)."""
    C1, C2 = 0.01**2, 0.03**2
    if axis_name is not None:
        img1 = _halo_extend_rows(img1, axis_name)
        img2 = _halo_extend_rows(img2, axis_name)
    mu1, mu2 = _avg_pool3(img1), _avg_pool3(img2)
    s1 = _avg_pool3(img1 * img1) - mu1 * mu1
    s2 = _avg_pool3(img2 * img2) - mu2 * mu2
    s12 = _avg_pool3(img1 * img2) - mu1 * mu2
    m = ((2 * mu1 * mu2 + C1) * (2 * s12 + C2)) / (
        (mu1 * mu1 + mu2 * mu2 + C1) * (s1 + s2 + C2)
    )
    if axis_name is not None:
        m = m[1:-1]
    return jnp.sum(m * mask)


def make_sharded_train_step(
    config,
    mesh,
    width: int,
    height: int,
    sh_degree: int,
    backend: str,
    scene_extent: float,
    donate: bool = True,
):
    """Build the jitted multi-chip train step. Images must arrive padded to
    (B, H_pad, W, 3) with H_pad = M * band_h (see ``band_geometry``)."""
    D = mesh.shape["data"]
    M = mesh.shape["model"]
    ts = config.tile_size
    band_h = cdiv(cdiv(height, ts), M) * ts
    h_pad = M * band_h
    lam = config.lambda_dssim
    optimize_poses = bool(getattr(config, "optimize_poses", False))

    def local_loss(params, alive, deltas, images, viewmats, Ks, view_idx):
        """Runs per-shard inside shard_map. ``params``/``alive`` arrive as
        this chip's gaussian SHARD (ZeRO: C/M rows of every tensor);
        ``deltas`` (V, 6) se(3) pose corrections arrive REPLICATED (the
        shard_map transpose psums their cotangents across the mesh);
        images: (Bl, band_h, W, 3); viewmats/Ks/view_idx: (Bl, ...)."""
        midx = jax.lax.axis_index("model")
        y0 = (midx * band_h).astype(jnp.float32)
        Cs = params.means.shape[0]

        # Phase 1 — project this chip's gaussian shard.
        means_s = params.means
        quats_s = quat_normalize(params.quats)
        scales_s = scale_activation(params.log_scales)
        sh_s = params.sh_coeffs
        opac_s = opacity_activation(
            jnp.where(alive[:, None], params.logit_opacities, -20.0)
        )[:, 0]

        Bl = images.shape[0]
        rows = jnp.arange(band_h, dtype=jnp.float32)[:, None, None]
        valid = (rows + y0) < float(height)  # (band_h, 1, 1)

        want_stats = backend == "pallas"
        stat_keys = ("n_isect", "n_dropped", "n_budget_dropped",
                     "n_grad_dropped") if want_stats else ()

        def render_one(carry, view):
            l1_sum, ssim_sum, mse_sum, radii_max, s_acc = carry
            gt, viewmat, K, vidx = view
            if optimize_poses:
                viewmat = apply_pose_delta(viewmat, deltas[vidx])
            proj = project_gaussians(
                means_s, quats_s, scales_s, viewmat, K, width, height,
                opacities=opac_s,
            )
            R = viewmat[:3, :3]
            t = viewmat[:3, 3]
            cam = -R.T @ t
            dirs = means_s - cam[None, :]
            dirs = dirs / jnp.maximum(jnp.linalg.norm(dirs, axis=-1, keepdims=True), 1e-12)
            colors_s = sh_to_color(sh_degree, sh_s, dirs)

            # Gather compact screen-space tensors across the model axis.
            ag = lambda x: jax.lax.all_gather(x, "model", axis=0, tiled=True)
            means2d = ag(proj.means2d)
            conics = ag(proj.conics)
            depths = ag(proj.depths)
            radii = ag(proj.radii)
            colors = ag(colors_s)
            opac = ag(opac_s)

            # Phase 2 — rasterize this chip's band (viewport shift in y).
            means2d_band = means2d - jnp.array([0.0, 1.0], means2d.dtype) * y0
            if backend == "pallas":
                from gaussian_splatting_tpu.ops.rasterize_pallas import rasterize_tiled

                # Raster options mirror the single-chip step exactly
                # (training/step.py): photometric loss -> depth never gets a
                # cotangent (depth_grad=False drops one reduce-sort payload);
                # sort_depth_bits and grad_buffer_frac are the same knobs.
                # tests/test_parallel_pallas.py::
                # test_sharded_pallas_matches_single_chip asserts the parity
                # by loss/parameter equality against the single-chip step.
                img, alpha_img, _, stats = rasterize_tiled(
                    means2d_band, conics, colors, opac, depths, radii,
                    width, band_h, tile_size=ts,
                    chunk=config.raster_chunk,
                    max_tiles_per_gaussian=config.max_tiles_per_gaussian,
                    class_budgets=config.class_budgets,
                    depth_bits=config.sort_depth_bits,
                    grad_buffer_frac=config.grad_buffer_frac,
                    sort_buckets=config.sort_buckets,
                    bucket_headroom=config.partition_headroom,
                    reduce_slices=config.reduce_slices,
                    sort_bands=getattr(config, "sort_bands", 0),
                    with_stats=True,
                    depth_grad=False,
                )
                s_acc = {k: s_acc[k] + stats[k] for k in stat_keys}
            else:
                out = rasterize_reference(
                    means2d_band, conics, colors, opac, depths, radii,
                    width, band_h, tile_size=ts,
                )
                img = out.image

            radii_max = jnp.maximum(radii_max, jax.lax.stop_gradient(radii))
            diff_mask = valid.astype(img.dtype)
            # Zero the pad rows before SSIM: the single-chip SSIM never sees
            # them, and its bottom-edge 3x3 windows zero-pad — the masked
            # render must look identical to those windows.
            r = stclamp(img) * diff_mask
            l1_b = jnp.sum(jnp.abs(r - gt) * diff_mask)
            ssim_b = _masked_ssim_sum(r, gt, diff_mask, axis_name="model")
            mse_b = jnp.sum(((jnp.clip(img, 0, 1) - gt) ** 2) * diff_mask)
            return (l1_sum + l1_b, ssim_sum + ssim_b, mse_sum + mse_b,
                    radii_max, s_acc), None

        C_full = Cs * M
        (l1_sum, ssim_sum, mse_sum, radii_max, s_acc), _ = jax.lax.scan(
            render_one,
            (jnp.float32(0.0), jnp.float32(0.0), jnp.float32(0.0),
             jnp.zeros((C_full,), jnp.int32),
             {k: jnp.int32(0) for k in stat_keys}),
            (images, viewmats, Ks, view_idx),
        )

        # Reduce over the whole mesh; normalize to global means.
        B = Bl * D
        n_px = jnp.float32(B * height * width * 3)
        l1_sum = jax.lax.psum(l1_sum, ("data", "model"))
        ssim_sum = jax.lax.psum(ssim_sum, ("data", "model"))
        mse_sum = jax.lax.psum(mse_sum, ("data", "model"))
        l1 = l1_sum / n_px
        ssim_mean = ssim_sum / n_px
        mse = mse_sum / n_px
        loss = (1.0 - lam) * l1 + lam * (1.0 - ssim_mean)
        psnr = jnp.where(mse < 1e-10, 100.0, -10.0 * jnp.log10(jnp.maximum(mse, 1e-10)))
        metrics = {"l1": l1, "ssim": ssim_mean, "psnr": psnr}
        # Overflow counters summed over the mesh (bands partition the tile
        # grid, so per-band counts add up to the single-chip totals).
        for k in stat_keys:
            metrics[f"stats/{k}"] = jax.lax.psum(s_acc[k], ("data", "model"))
        # Densify bookkeeping: per-gaussian max screen radius across all
        # bands/views, returned as this chip's shard (the gathered radii are
        # identical across "model"; reduce over "data").
        radii_max = jax.lax.dynamic_slice_in_dim(radii_max, midx * Cs, Cs, 0)
        radii_max = jax.lax.pmax(radii_max, "data")
        return loss, (metrics, radii_max)

    metric_keys = ["l1", "ssim", "psnr"]
    if backend == "pallas":
        metric_keys += [f"stats/{k}" for k in (
            "n_isect", "n_dropped", "n_budget_dropped", "n_grad_dropped")]
    sharded_loss = shard_map(
        local_loss,
        mesh=mesh,
        in_specs=(
            P("model"),               # params: ZeRO-sharded over gaussians
            P("model"),               # alive: sharded with the params
            P(),                      # pose deltas: replicated (V, 6)
            P("data", "model", None, None),  # images: views x bands
            P("data", None, None),    # viewmats per-view
            P("data", None, None),    # Ks
            P("data"),                # view_idx per-view
        ),
        out_specs=(P(), ({k: P() for k in metric_keys}, P("model"))),
        check_vma=False,
    )

    # ZeRO placement: every leading-dim-C tensor (params, Adam moments,
    # densify accumulators, alive) lives sharded over the "model" axis; the
    # optimizer update below then runs shard-local and per-chip state memory
    # is 1/M of replicated.
    gauss_sharding = jax.sharding.NamedSharding(mesh, P("model"))

    def shard_state(state: TrainState) -> TrainState:
        C = state.gauss.params.means.shape[0]
        if C % M != 0:
            raise ValueError(f"capacity {C} must divide model axis {M}")
        return jax.tree_util.tree_map(
            lambda x: (jax.lax.with_sharding_constraint(x, gauss_sharding)
                       if hasattr(x, "ndim") and x.ndim >= 1
                       and x.shape[0] == C else x),
            state)

    def step(state: TrainState, batch: ViewBatch):
        state = shard_state(state)
        pose_on = optimize_poses and state.poses is not None
        view_idx = (batch.view_idx if batch.view_idx is not None
                    else jnp.zeros((batch.images.shape[0],), jnp.int32))

        def loss_fn(params, deltas):
            loss, (metrics, radii_max) = sharded_loss(
                params, state.gauss.alive, deltas,
                batch.images, batch.viewmats, batch.Ks, view_idx,
            )
            reg = scale_ratio_reg(
                params.log_scales, state.gauss.alive,
                config.scale_reg_max_ratio, config.scale_reg_weight,
            )
            return loss + reg, (dict(metrics, scale_reg=reg), radii_max)

        deltas_in = (state.poses.deltas if pose_on
                     else jnp.zeros((1, 6), jnp.float32))
        (loss, (metrics, radii_max)), (grads, grads_pose) = jax.value_and_grad(
            loss_fn, argnums=(0, 1), has_aux=True)(
                state.gauss.params, deltas_in)
        xyz_lr = xyz_lr_schedule(config, state.iteration)
        lrs = group_lrs(config, xyz_lr)
        new_params, new_opt = adam_update(
            grads, state.opt, state.gauss.params, lrs,
            b1=config.adam_b1, b2=config.adam_b2, eps=config.adam_eps,
        )
        ceiling = jnp.log(jnp.float32(scene_extent) * config.scale_clamp_ratio + 1e-9)
        new_params = dataclasses.replace(
            new_params, log_scales=jnp.minimum(new_params.log_scales, ceiling)
        )
        gnorm = jnp.linalg.norm(grads.means, axis=-1, keepdims=True)
        gauss = dataclasses.replace(
            state.gauss,
            params=new_params,
            xyz_grad_accum=state.gauss.xyz_grad_accum + gnorm,
            xyz_grad_count=state.gauss.xyz_grad_count + 1.0,
            max_radii2d=jnp.maximum(state.gauss.max_radii2d, radii_max),
        )
        # Pose refinement: identical Adam form to the single-chip step
        # (training/step.py) — the (V, 6) state is replicated, so the update
        # runs identically on every chip.
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
        new_state = shard_state(
            TrainState(gauss=gauss, opt=new_opt, iteration=state.iteration + 1,
                       poses=new_poses))
        # Per-group gradient norms — keep mesh runs logging everything the
        # single-chip step does (training/step.py).
        gn = {
            f"grad_norm/{k}": jnp.linalg.norm(getattr(grads, k))
            for k in ("means", "quats", "log_scales", "logit_opacities",
                      "features_dc", "features_rest")
        }
        return new_state, dict(metrics, loss=loss, xyz_lr=xyz_lr, **gn)

    donate_args = (0,) if donate else ()
    return jax.jit(step, donate_argnums=donate_args), band_h, h_pad


def pad_images_for_bands(images, h_pad):
    """Zero-pad (B, H, W, 3) images to (B, h_pad, W, 3) for band sharding."""
    B, H, W, C = images.shape
    if H == h_pad:
        return images
    return jnp.pad(images, ((0, 0), (0, h_pad - H), (0, 0), (0, 0)))
