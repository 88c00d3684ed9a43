"""Pure-JAX reference rasterizer — the correctness oracle.

Implements exactly the semantics of the reference's external CUDA rasterizer
(tile-binned, depth-sorted, front-to-back alpha blending with alpha clamp at
0.999, 1/255 alpha skip, and early termination at T <= 1e-4), but as one
vectorized XLA computation instead of a sequential per-pixel loop.

Key idea (TPU-native): front-to-back compositing

    C = sum_k  c_k * alpha_k * prod_{j<k} (1 - alpha_j)

is sequential as written, but the transmittance prefix product is
``exp(cumsum(log1p(-alpha)))`` — an associative scan — so the whole blend
vectorizes: an (pixels x gaussians) alpha matrix, a cumsum along the gaussian
axis, and a matmul with the color matrix (MXU). The early-termination mask
``T > 1e-4`` is monotone along the sorted axis, so masking reproduces the
sequential break exactly.

This module is fully differentiable via JAX autodiff and is used to validate
the hand-written Pallas kernels (pixel + gradient allclose). It is O(P*N)
memory per pixel-chunk, intended for small test scenes, not production.
"""

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

ALPHA_CLAMP = 0.999
ALPHA_SKIP = 1.0 / 255.0
T_EARLY_STOP = 1e-4


class RasterOut(NamedTuple):
    image: jnp.ndarray        # (H, W, C) blended colors (+ T_final * bg)
    alpha: jnp.ndarray        # (H, W) 1 - T_final
    depth: jnp.ndarray        # (H, W) accumulated (w-weighted) depth


def _alpha_matrix(px, py, means2d, conics, opacities):
    """alpha for each (pixel, gaussian) pair.

    px, py: (P,) pixel centers; means2d (N,2), conics (N,3), opacities (N,).
    Returns (P, N).
    """
    dx = px[:, None] - means2d[None, :, 0]
    dy = py[:, None] - means2d[None, :, 1]
    A, B, C = conics[:, 0], conics[:, 1], conics[:, 2]
    sigma = 0.5 * (A[None, :] * dx * dx + C[None, :] * dy * dy) + B[None, :] * dx * dy
    alpha = jnp.minimum(ALPHA_CLAMP, opacities[None, :] * jnp.exp(-sigma))
    alpha = jnp.where((sigma < 0.0) | (alpha < ALPHA_SKIP), 0.0, alpha)
    return alpha


def blend_weights(alpha: jnp.ndarray, t_start: Optional[jnp.ndarray] = None):
    """Front-to-back blend weights from per-(pixel, gaussian) alphas in
    depth-sorted order.

    alpha: (P, K). Returns (w (P, K), T_final (P,)).
    Early termination: a gaussian whose blend would push T to <= 1e-4 and all
    gaussians after it are excluded — identical to the sequential break.
    The mask is discrete (stop-gradient), matching the CUDA backward which
    never differentiates the stopping point.
    """
    if t_start is None:
        t_start = jnp.ones(alpha.shape[:-1], alpha.dtype)
    log1ma = jnp.log1p(-alpha)
    S = jnp.cumsum(log1ma, axis=-1)            # inclusive prefix
    T_after = t_start[..., None] * jnp.exp(S)
    T_before = t_start[..., None] * jnp.exp(S - log1ma)
    mask = jax.lax.stop_gradient(T_after > T_EARLY_STOP)
    w = alpha * T_before * mask
    T_final = t_start * jnp.exp(jnp.sum(jnp.where(mask, log1ma, 0.0), axis=-1))
    return w, T_final


def rasterize_reference(
    means2d: jnp.ndarray,
    conics: jnp.ndarray,
    colors: jnp.ndarray,
    opacities: jnp.ndarray,
    depths: jnp.ndarray,
    radii: jnp.ndarray,
    width: int,
    height: int,
    bg: Optional[jnp.ndarray] = None,
    tile_size: Optional[int] = None,
    pixel_chunk_rows: int = 32,
) -> RasterOut:
    """Rasterize N screen-space gaussians over the full image.

    If ``tile_size`` is given, a gaussian contributes to a pixel only when the
    pixel's tile intersects the gaussian's radius bounding box — bit-matching
    the tile-binned kernels (and the reference's CUDA tile binning). With
    ``tile_size=None`` every gaussian affects every pixel (pure math oracle).
    """
    N = means2d.shape[0]
    C = colors.shape[-1]
    if bg is None:
        bg = jnp.zeros((C,), colors.dtype)

    # Global front-to-back order; culled gaussians pushed to the back with
    # alpha forced to zero.
    sort_depth = jnp.where(radii > 0, depths, jnp.inf)
    order = jnp.argsort(sort_depth)
    means_s = means2d[order]
    conics_s = conics[order]
    colors_s = colors[order]
    opac_s = jnp.where(radii[order] > 0, opacities[order], 0.0)
    depth_s = depths[order]
    radii_s = radii[order]

    if tile_size is not None:
        ts = float(tile_size)
        r = radii_s.astype(means_s.dtype)
        # Tile bbox per gaussian, matching the binning convention in
        # ops/tiling.py: [floor((m - r)/ts), ceil((m + r)/ts)).
        tx0 = jnp.floor((means_s[:, 0] - r) / ts)
        tx1 = jnp.ceil((means_s[:, 0] + r) / ts)
        ty0 = jnp.floor((means_s[:, 1] - r) / ts)
        ty1 = jnp.ceil((means_s[:, 1] + r) / ts)

    rows_grid = jnp.arange(height, dtype=jnp.int32)

    def render_rows(y0):
        ys = y0 + jnp.arange(pixel_chunk_rows, dtype=jnp.int32)
        xs = jnp.arange(width, dtype=jnp.int32)
        py = (ys.astype(colors.dtype) + 0.5)[:, None].repeat(width, 1).reshape(-1)
        px = (xs.astype(colors.dtype) + 0.5)[None, :].repeat(pixel_chunk_rows, 0).reshape(-1)
        alpha = _alpha_matrix(px, py, means_s, conics_s, opac_s)  # (P, N)
        if tile_size is not None:
            ptx = jnp.floor(px / ts)
            pty = jnp.floor(py / ts)
            in_tile = (
                (ptx[:, None] >= tx0[None, :])
                & (ptx[:, None] < tx1[None, :])
                & (pty[:, None] >= ty0[None, :])
                & (pty[:, None] < ty1[None, :])
            )
            alpha = jnp.where(in_tile, alpha, 0.0)
        w, T_final = blend_weights(alpha)
        # HIGHEST precision: this is the correctness oracle — never let the
        # TPU default bf16 matmul passes blur the reference values.
        img = (
            jnp.dot(w, colors_s, precision=jax.lax.Precision.HIGHEST)
            + T_final[:, None] * bg[None, :]
        )
        depth_acc = jnp.dot(w, depth_s[:, None], precision=jax.lax.Precision.HIGHEST)
        return img, 1.0 - T_final, depth_acc[:, 0]

    n_chunks = -(-height // pixel_chunk_rows)
    pad_h = n_chunks * pixel_chunk_rows
    starts = jnp.arange(n_chunks, dtype=jnp.int32) * pixel_chunk_rows
    imgs, alphas, depths_out = jax.lax.map(render_rows, starts)
    image = imgs.reshape(pad_h, width, C)[:height]
    alpha_img = alphas.reshape(pad_h, width)[:height]
    depth_img = depths_out.reshape(pad_h, width)[:height]
    return RasterOut(image=image, alpha=alpha_img, depth=depth_img)
