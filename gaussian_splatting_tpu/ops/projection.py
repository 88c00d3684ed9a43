"""Perspective projection of anisotropic 3D gaussians to screen space.

Fully batched pure JAX — one fused XLA computation over all N gaussians (this
is VPU-elementwise + tiny fixed-size matmul work and XLA fuses it well; the
Pallas effort is reserved for the tile rasterization where the real hot loop
lives).

Math (EWA splatting, identical semantics to the reference's external CUDA
rasterizer — reference ``gsplat_backend.py:83-97`` is the call site):

    p_cam  = W_rot @ p_world + W_t
    Sigma3 = R S S^T R^T                (R from unit quat, S = diag(scales))
    Sigma_cam = W_rot Sigma3 W_rot^T
    J      = [[fx/z, 0, -fx x/z^2], [0, fy/z, -fy y/z^2]]   (frustum-clamped)
    Sigma2 = J Sigma_cam J^T + eps2d * I                    (eps2d = 0.3)
    conic  = Sigma2^{-1}
    radius = ceil(3 * sqrt(lambda_max(Sigma2)))

Gaussians behind the near plane or with degenerate covariance are masked out
(radius = 0), never dropped — static shapes everywhere.
"""

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from gaussian_splatting_tpu.core.quaternions import quat_normalize, quat_to_rotmat


class Projected(NamedTuple):
    """Screen-space gaussians. All arrays have leading dim N (static)."""

    means2d: jnp.ndarray   # (N, 2) pixel coords
    depths: jnp.ndarray    # (N,) camera-frame z
    conics: jnp.ndarray    # (N, 3) upper-triangular inverse 2D covariance (a, b, c)
    radii: jnp.ndarray     # (N,) int32 screen radius in pixels, 0 = culled
    compensations: jnp.ndarray  # (N,) det ratio (antialiasing compensation factor)


def compute_cov3d(quats: jnp.ndarray, scales: jnp.ndarray) -> jnp.ndarray:
    """Sigma3 = R S S^T R^T. quats (N,4) raw (normalized here), scales (N,3)
    already exp-activated. Returns (N, 3, 3)."""
    R = quat_to_rotmat(quat_normalize(quats))
    M = R * scales[..., None, :]  # R @ diag(s)
    return M @ jnp.swapaxes(M, -1, -2)


def project_gaussians(
    means: jnp.ndarray,
    quats: jnp.ndarray,
    scales: jnp.ndarray,
    viewmat: jnp.ndarray,
    K: jnp.ndarray,
    width: int,
    height: int,
    eps2d: float = 0.3,
    near_plane: float = 0.01,
    far_plane: float = 1e10,
    radius_clip: float = 0.0,
    opacities: Optional[jnp.ndarray] = None,
) -> Projected:
    """Project N gaussians through one camera. Differentiable w.r.t.
    means/quats/scales (camera grads unused by the trainer, matching the
    reference where camera gradients never flow — reference ``trainer.py``
    call stack §3.3)."""
    dtype = means.dtype
    R_wc = viewmat[:3, :3].astype(dtype)
    t_wc = viewmat[:3, 3].astype(dtype)
    fx, fy = K[0, 0], K[1, 1]
    cx, cy = K[0, 2], K[1, 2]

    p_cam = means @ R_wc.T + t_wc  # (N, 3)
    x, y, z = p_cam[:, 0], p_cam[:, 1], p_cam[:, 2]
    # Depth guard: clamp z away from 0 for the math; visibility handled by mask.
    zs = jnp.where(jnp.abs(z) < 1e-6, 1e-6, z)

    cov3d = compute_cov3d(quats, scales)                # (N, 3, 3)
    cov_cam = jnp.einsum("ij,njk,lk->nil", R_wc, cov3d, R_wc)  # (N, 3, 3)

    # Frustum-limited Jacobian: clamp x/z, y/z into 1.3x the view cone so
    # off-screen gaussians don't produce exploding covariances.
    tan_fovx = 0.5 * width / fx
    tan_fovy = 0.5 * height / fy
    lim_x = 1.3 * tan_fovx
    lim_y = 1.3 * tan_fovy
    tx = zs * jnp.clip(x / zs, -lim_x, lim_x)
    ty = zs * jnp.clip(y / zs, -lim_y, lim_y)

    rz = 1.0 / zs
    rz2 = rz * rz
    # J (N, 2, 3)
    J = jnp.stack(
        [
            jnp.stack([fx * rz, jnp.zeros_like(rz), -fx * tx * rz2], axis=-1),
            jnp.stack([jnp.zeros_like(rz), fy * rz, -fy * ty * rz2], axis=-1),
        ],
        axis=-2,
    )
    cov2d = jnp.einsum("nij,njk,nlk->nil", J, cov_cam, J)  # (N, 2, 2)
    a = cov2d[:, 0, 0]
    b = cov2d[:, 0, 1]
    c = cov2d[:, 1, 1]

    det_orig = a * c - b * b
    a = a + eps2d
    c = c + eps2d
    det = a * c - b * b
    det_safe = jnp.where(det <= 0.0, 1.0, det)
    compensations = jnp.sqrt(jnp.maximum(det_orig / det_safe, 0.0))

    inv_det = 1.0 / det_safe
    conic_a = c * inv_det
    conic_b = -b * inv_det
    conic_c = a * inv_det
    conics = jnp.stack([conic_a, conic_b, conic_c], axis=-1)

    # Screen radius from the max eigenvalue of Sigma2. The support of a
    # contribution is alpha = op * exp(-s) >= 1/255, i.e. s <= ln(255*op):
    # with opacities given, the radius shrinks to sqrt(2*ln(255*op)) sigma
    # (capped at the classic 3 sigma) — EXACT, since pixels outside can
    # never pass the kernels' alpha gate; low-opacity gaussians bin to far
    # fewer tiles (gsplat's opacity-aware culling).
    mid = 0.5 * (a + c)
    disc = jnp.sqrt(jnp.maximum(mid * mid - det, 0.01))
    lambda_max = mid + disc
    sigma_mult = jnp.float32(3.0)
    if opacities is not None:
        op = jax.lax.stop_gradient(opacities.reshape(-1).astype(jnp.float32))
        s_cut = jnp.log(jnp.maximum(op, 1e-12) * 255.0)
        sigma_mult = jnp.minimum(3.0, jnp.sqrt(2.0 * jnp.maximum(s_cut, 1e-12)))
    radius_f = jnp.ceil(sigma_mult * jnp.sqrt(jnp.maximum(lambda_max, 0.0)))

    mean_x = fx * x * rz + cx
    mean_y = fy * y * rz + cy
    means2d = jnp.stack([mean_x, mean_y], axis=-1)

    inside = (
        (mean_x + radius_f > 0)
        & (mean_x - radius_f < width)
        & (mean_y + radius_f > 0)
        & (mean_y - radius_f < height)
    )
    valid = (z > near_plane) & (z < far_plane) & (det > 0.0) & inside
    valid = valid & (radius_f > radius_clip)
    radii = jnp.where(valid, radius_f, 0.0).astype(jnp.int32)

    return Projected(
        means2d=means2d,
        depths=z,
        conics=conics,
        radii=radii,
        compensations=compensations,
    )
