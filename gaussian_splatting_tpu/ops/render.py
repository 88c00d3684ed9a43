"""High-level differentiable render: gaussian params + camera -> image.

Mirrors the surface the reference exposes through its backend adapter
(``gsplat_backend.py:129`` ``render_with_depth``): render modes RGB / D / ED /
RGB+D / RGB+ED, background color, active SH degree; returns the rendered
image, alpha, depth, and meta (means2d, radii, visibility) for the
densification bookkeeping.

Backends:
- ``"ref"``    — the pure-JAX oracle (rasterize_ref), runs anywhere.
- ``"pallas"`` — the hand-written TPU kernels (rasterize_pallas).
"""

from typing import NamedTuple, Optional

import jax.numpy as jnp

from gaussian_splatting_tpu.core.activations import opacity_activation, scale_activation
from gaussian_splatting_tpu.core.sh import sh_to_color
from gaussian_splatting_tpu.ops.projection import project_gaussians
from gaussian_splatting_tpu.ops.rasterize_ref import rasterize_reference


class RenderOut(NamedTuple):
    render: jnp.ndarray       # (H, W, C) — RGB, depth, or concat per render_mode
    alpha: jnp.ndarray        # (H, W)
    depth: jnp.ndarray        # (H, W) accumulated or expected depth
    means2d: jnp.ndarray      # (N, 2)
    radii: jnp.ndarray        # (N,)
    visibility: jnp.ndarray   # (N,) bool — radius > 0
    stats: Optional[dict] = None  # overflow counters (pallas backend only)


def render(
    means: jnp.ndarray,
    quats: jnp.ndarray,
    log_scales: jnp.ndarray,
    logit_opacities: jnp.ndarray,
    sh_coeffs: jnp.ndarray,
    viewmat: jnp.ndarray,
    K: jnp.ndarray,
    width: int,
    height: int,
    sh_degree: int = 3,
    bg: Optional[jnp.ndarray] = None,
    render_mode: str = "RGB",
    backend: str = "ref",
    tile_size: int = 16,
    max_tiles_per_gaussian: int = 16,
    raster_chunk: int = 256,
    class_budgets=None,
    depth_bits: int = 0,
    grad_buffer_frac: float = 1.0,
    sort_buckets: int = 0,
    bucket_headroom: float = 1.5,
    reduce_slices: int = 0,
    sort_bands: int = 0,
    rasterize_mode: str = "classic",
    with_stats: bool = False,
    depth_grad: bool = True,
) -> RenderOut:
    """Render one view.

    Parameters are *raw* (log scales, logit opacities, unnormalized quats) —
    activations applied here, matching ``gaussian_model.py:86-88``.
    sh_coeffs: (N, K, 3) with K >= (sh_degree+1)^2.
    ``rasterize_mode="antialiased"`` multiplies opacity by the covariance
    compensation factor (gsplat's antialiased mode; differentiable through
    the pure-JAX projection).
    ``depth_grad=False`` (pallas backend): caller promises never to
    differentiate the depth output — RenderOut.depth still renders, but its
    cotangent is treated as zero, saving one backward sort payload.
    """
    scales = scale_activation(log_scales)
    opac = opacity_activation(logit_opacities.reshape(-1))
    # (quats are normalized inside project_gaussians, in column form — an
    # explicit (N,4) quat_normalize here would materialize a 32x-padded temp
    # at production N; see ops/projection._rotmat_cols.)

    # Opacity-aware radii: the pre-compensation opacity is an upper bound on
    # the effective one, so the shrunken support stays exact.
    proj = project_gaussians(means, quats, scales, viewmat, K, width, height,
                             opacities=opac)
    if rasterize_mode == "antialiased":
        opac = opac * proj.compensations
    elif rasterize_mode != "classic":
        raise ValueError(f"unknown rasterize_mode {rasterize_mode!r}")

    # View directions from the camera center to each gaussian (world frame).
    R = viewmat[:3, :3]
    t = viewmat[:3, 3]
    cam_pos = -R.T @ t
    dirs = means - cam_pos[None, :]
    dirs = dirs / jnp.maximum(jnp.linalg.norm(dirs, axis=-1, keepdims=True), 1e-12)
    colors = sh_to_color(sh_degree, sh_coeffs, dirs)  # (N, 3)

    stats = None
    if backend == "ref":
        out = rasterize_reference(
            proj.means2d, proj.conics, colors, opac, proj.depths,
            proj.radii, width, height, bg=bg, tile_size=tile_size,
        )
        image, alpha_img, depth_img = out.image, out.alpha, out.depth
    elif backend == "pallas":
        from gaussian_splatting_tpu.ops.rasterize_pallas import rasterize_tiled

        res = rasterize_tiled(
            proj.means2d, proj.conics, colors, opac, proj.depths, proj.radii,
            width, height, bg=bg, tile_size=tile_size,
            chunk=raster_chunk,
            max_tiles_per_gaussian=max_tiles_per_gaussian,
            class_budgets=class_budgets, depth_bits=depth_bits,
            grad_buffer_frac=grad_buffer_frac,
            sort_buckets=sort_buckets, bucket_headroom=bucket_headroom,
            reduce_slices=reduce_slices, sort_bands=sort_bands,
            with_stats=with_stats,
            depth_grad=depth_grad,
        )
        if with_stats:
            image, alpha_img, depth_img, stats = res
        else:
            image, alpha_img, depth_img = res
    else:
        raise ValueError(f"unknown backend {backend!r}")

    if render_mode == "RGB":
        rendered = image
    elif render_mode == "D":
        rendered = depth_img[..., None]
    elif render_mode == "ED":
        rendered = (depth_img / jnp.maximum(alpha_img, 1e-10))[..., None]
    elif render_mode == "RGB+D":
        rendered = jnp.concatenate([image, depth_img[..., None]], axis=-1)
    elif render_mode == "RGB+ED":
        ed = depth_img / jnp.maximum(alpha_img, 1e-10)
        rendered = jnp.concatenate([image, ed[..., None]], axis=-1)
    else:
        raise ValueError(f"unknown render_mode {render_mode!r}")

    return RenderOut(
        render=rendered,
        alpha=alpha_img,
        depth=depth_img,
        means2d=proj.means2d,
        radii=proj.radii,
        visibility=proj.radii > 0,
        stats=stats,
    )


def render_grad_meta(
    means, quats, log_scales, logit_opacities, sh_coeffs, viewmat, K,
    width, height, sh_degree=3, tile_size=16, max_tiles_per_gaussian=16,
    raster_chunk=256, class_budgets=None, depth_bits=0,
    grad_buffer_frac=1.0, sort_buckets=0, bucket_headroom=1.5,
    sort_bands=0, rasterize_mode="classic",
):
    """Exact gradient-buffer occupancy (n_written, n_dropped, grad_cap) for
    one view through the pallas backend — the trainer's probe for sizing
    ``grad_buffer_frac`` (see rasterize_pallas.rasterize_grad_meta)."""
    from gaussian_splatting_tpu.ops.rasterize_pallas import rasterize_grad_meta

    scales = scale_activation(log_scales)
    opac = opacity_activation(logit_opacities.reshape(-1))
    proj = project_gaussians(means, quats, scales, viewmat, K, width, height,
                             opacities=opac)
    if rasterize_mode == "antialiased":
        opac = opac * proj.compensations
    R = viewmat[:3, :3]
    t = viewmat[:3, 3]
    cam_pos = -R.T @ t
    dirs = means - cam_pos[None, :]
    dirs = dirs / jnp.maximum(jnp.linalg.norm(dirs, axis=-1, keepdims=True), 1e-12)
    colors = sh_to_color(sh_degree, sh_coeffs, dirs)
    return rasterize_grad_meta(
        proj.means2d, proj.conics, colors, opac, proj.depths, proj.radii,
        width, height, tile_size=tile_size, chunk=raster_chunk,
        max_tiles_per_gaussian=max_tiles_per_gaussian,
        class_budgets=class_budgets, depth_bits=depth_bits,
        grad_buffer_frac=grad_buffer_frac,
        sort_buckets=sort_buckets, bucket_headroom=bucket_headroom,
        sort_bands=sort_bands,
    )
