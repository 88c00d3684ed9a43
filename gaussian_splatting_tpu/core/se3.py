"""SE(3) exponential map for differentiable camera-pose refinement.

The reference pipeline bootstraps camera poses from incremental SfM and
never refines them (reference ``trainer.py`` call stack §3.3: camera
gradients never flow). That leaves reconstruction quality capped by the
SfM pose error — measured on the synthetic-orbit benchmark, train-view
PSNR tracks val-view PSNR at ~16 dB while the same model with exact poses
reaches 47 dB (BENCH.md). Pose refinement optimizes a small se(3) delta
per training view jointly with the gaussians; everything here is plain
differentiable JAX, so the pose gradients ride the existing projection
autodiff (``ops/projection.py`` is pure JAX all the way into the Pallas
rasterizer's custom_vjp).

Convention: a delta xi = (omega, upsilon) in R^6 corrects a world-to-camera
matrix by LEFT multiplication in camera frame:

    viewmat' = exp([xi]) @ viewmat,
    exp([xi]) = [[R(omega), V(omega) upsilon], [0, 1]]

with R = Rodrigues(omega) and V the left-Jacobian of SO(3). Small-angle
paths use Taylor series (exactly what a zero delta must produce: the
identity, with zero — not NaN — gradients).
"""

import jax.numpy as jnp


def _hat(w):
    """(..., 3) -> (..., 3, 3) skew-symmetric cross-product matrix."""
    wx, wy, wz = w[..., 0], w[..., 1], w[..., 2]
    z = jnp.zeros_like(wx)
    return jnp.stack([
        jnp.stack([z, -wz, wy], axis=-1),
        jnp.stack([wz, z, -wx], axis=-1),
        jnp.stack([-wy, wx, z], axis=-1),
    ], axis=-2)


def se3_exp(xi: jnp.ndarray) -> jnp.ndarray:
    """Exponential map se(3) -> SE(3). xi (..., 6) = (omega, upsilon);
    returns (..., 4, 4) homogeneous transforms. Differentiable at xi = 0
    (Taylor branches selected with jnp.where on theta^2)."""
    omega = xi[..., 0:3]
    ups = xi[..., 3:6]
    th2 = jnp.sum(omega * omega, axis=-1)[..., None, None]  # (..., 1, 1)
    small = th2 < 1e-8
    # Sanitize the untaken branch's denominators: jnp.where passes gradients
    # through BOTH branches, and d/domega of sin(th)/th at th = 0 is NaN
    # unless the divisor is masked to a finite dummy first.
    th2_safe = jnp.where(small, 1.0, th2)
    th = jnp.sqrt(th2_safe)

    K = _hat(omega)
    K2 = K @ K
    eye = jnp.broadcast_to(jnp.eye(3, dtype=xi.dtype), K.shape)

    # sin(th)/th and (1-cos(th))/th^2 with Taylor fallbacks.
    a = jnp.where(small, 1.0 - th2 / 6.0, jnp.sin(th) / th)
    b = jnp.where(small, 0.5 - th2 / 24.0, (1.0 - jnp.cos(th)) / th2_safe)
    # (th - sin(th)) / th^3 for the left Jacobian.
    c = jnp.where(small, 1.0 / 6.0 - th2 / 120.0, (1.0 - a) / th2_safe)

    R = eye + a * K + b * K2
    V = eye + b * K + c * K2
    t = (V @ ups[..., None])[..., 0]

    top = jnp.concatenate([R, t[..., None]], axis=-1)          # (..., 3, 4)
    bottom = jnp.broadcast_to(
        jnp.asarray([0.0, 0.0, 0.0, 1.0], xi.dtype),
        top.shape[:-2] + (1, 4))
    return jnp.concatenate([top, bottom], axis=-2)


def apply_pose_delta(viewmat: jnp.ndarray, xi: jnp.ndarray) -> jnp.ndarray:
    """Left-multiply the world-to-camera ``viewmat`` (4, 4) by exp(xi) —
    a camera-frame correction (rotates/translates the camera itself, so a
    small xi perturbs the image by roughly f * |xi| pixels regardless of
    scene depth)."""
    return se3_exp(xi) @ viewmat


def se3_log_rot_angle(R: jnp.ndarray) -> jnp.ndarray:
    """Rotation angle (radians) of (..., 3, 3) rotation matrices — the
    geodesic pose-rotation error metric used by the tests."""
    tr = R[..., 0, 0] + R[..., 1, 1] + R[..., 2, 2]
    return jnp.arccos(jnp.clip((tr - 1.0) / 2.0, -1.0, 1.0))
