"""Real spherical harmonics, degrees 0..3, batched pure-JAX.

Matches the standard 3DGS / gsplat SH convention used by the reference's
renderer (reference ``gsplat_backend.py:168-182`` passes ``sh_degree`` through
to ``gsplat.rasterization``): the decoded color is

    color = max(SH(view_dir, coeffs) + 0.5, 0)

and the DC coefficient relates to RGB via ``sh0 = (rgb - 0.5) / 0.282...``
(reference ``trainer.py:1036-1040``).

Coefficient layout: ``(N, K, 3)`` with ``K = (degree+1)^2`` bases; the
reference stores DC separately as ``features_dc (N,1,3)`` and the rest as
``features_rest (N,15,3)``; here we keep the same split in the model and
concatenate at eval time.
"""

import jax.numpy as jnp

SH_C0 = 0.28209479177387814
SH_C1 = 0.4886025119029199
SH_C2 = (
    1.0925484305920792,
    -1.0925484305920792,
    0.31539156525252005,
    -1.0925484305920792,
    0.5462742152960396,
)
SH_C3 = (
    -0.5900435899266435,
    2.890611442640554,
    -0.4570457994644658,
    0.3731763325901154,
    -0.4570457994644658,
    1.445305721320277,
    -0.5900435899266435,
)


def num_sh_bases(degree: int) -> int:
    return (degree + 1) ** 2


def eval_sh(degree: int, coeffs: jnp.ndarray, dirs: jnp.ndarray) -> jnp.ndarray:
    """Evaluate SH at unit directions.

    degree: static int in [0, 3] — the *active* degree; coefficients beyond it
      are ignored (the SH-warmup schedule relies on this: early iterations
      evaluate 1 basis instead of 16).
    coeffs: (..., K, 3) with K >= (degree+1)^2.
    dirs:   (..., 3) unit vectors (world-frame view directions).
    Returns (..., 3) raw SH colors (no +0.5 shift applied here).
    """
    result = SH_C0 * coeffs[..., 0, :]
    if degree >= 1:
        x, y, z = dirs[..., 0:1], dirs[..., 1:2], dirs[..., 2:3]
        result = (
            result
            - SH_C1 * y * coeffs[..., 1, :]
            + SH_C1 * z * coeffs[..., 2, :]
            - SH_C1 * x * coeffs[..., 3, :]
        )
        if degree >= 2:
            xx, yy, zz = x * x, y * y, z * z
            xy, yz, xz = x * y, y * z, x * z
            result = (
                result
                + SH_C2[0] * xy * coeffs[..., 4, :]
                + SH_C2[1] * yz * coeffs[..., 5, :]
                + SH_C2[2] * (2.0 * zz - xx - yy) * coeffs[..., 6, :]
                + SH_C2[3] * xz * coeffs[..., 7, :]
                + SH_C2[4] * (xx - yy) * coeffs[..., 8, :]
            )
            if degree >= 3:
                result = (
                    result
                    + SH_C3[0] * y * (3.0 * xx - yy) * coeffs[..., 9, :]
                    + SH_C3[1] * xy * z * coeffs[..., 10, :]
                    + SH_C3[2] * y * (4.0 * zz - xx - yy) * coeffs[..., 11, :]
                    + SH_C3[3] * z * (2.0 * zz - 3.0 * xx - 3.0 * yy) * coeffs[..., 12, :]
                    + SH_C3[4] * x * (4.0 * zz - xx - yy) * coeffs[..., 13, :]
                    + SH_C3[5] * z * (xx - yy) * coeffs[..., 14, :]
                    + SH_C3[6] * x * (xx - 3.0 * yy) * coeffs[..., 15, :]
                )
    return result


def sh_to_color(degree: int, coeffs: jnp.ndarray, dirs: jnp.ndarray) -> jnp.ndarray:
    """SH -> clamped RGB in [0, inf): max(SH + 0.5, 0). gsplat semantics."""
    return jnp.maximum(eval_sh(degree, coeffs, dirs) + 0.5, 0.0)


def rgb_to_sh0(rgb: jnp.ndarray) -> jnp.ndarray:
    """RGB in [0,1] -> DC SH coefficient (reference ``trainer.py:1036-1040``)."""
    return (rgb - 0.5) / SH_C0


def sh0_to_rgb(sh0: jnp.ndarray) -> jnp.ndarray:
    return sh0 * SH_C0 + 0.5
