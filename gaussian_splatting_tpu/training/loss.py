"""Losses: L1 + DSSIM photometric objective with straight-through clamp, and
the scale-anisotropy hinge regularizer — matching the reference trainer
exactly (``trainer.py:102-107`` stclamp, ``:354-371`` SSIM, ``:434-445``
scale reg, ``:485-502`` combination)."""

import jax
import jax.numpy as jnp

from gaussian_splatting_tpu.core.activations import scale_activation


def stclamp(x: jnp.ndarray) -> jnp.ndarray:
    """Forward: clamp to [0,1]; backward: identity (straight-through), so
    colors that drift out of range still receive corrective gradient."""
    return x + jax.lax.stop_gradient(jnp.clip(x, 0.0, 1.0) - x)


def _avg_pool3(img: jnp.ndarray) -> jnp.ndarray:
    """3x3 average pool, stride 1, zero padding 1 — the reference's
    ``F.avg_pool2d(img, 3, 1, padding=1)`` (count includes padding, i.e.
    divide by 9 everywhere). img: (..., H, W, C)."""
    k = jnp.ones((3, 3), img.dtype) / 9.0
    # reduce_window sum then scale: zero-padded borders match torch's
    # count_include_pad=True default.
    s = jax.lax.reduce_window(
        img, 0.0, jax.lax.add, (1,) * (img.ndim - 3) + (3, 3, 1),
        (1,) * img.ndim, "SAME",
    )
    return s / 9.0


def ssim(img1: jnp.ndarray, img2: jnp.ndarray) -> jnp.ndarray:
    """Reference SSIM variant: 3x3 avg-pool local statistics
    (``trainer.py:354-371``). imgs: (H, W, C) in [0,1]. Returns scalar mean."""
    C1, C2 = 0.01**2, 0.03**2
    mu1 = _avg_pool3(img1)
    mu2 = _avg_pool3(img2)
    mu1_sq, mu2_sq, mu1_mu2 = mu1 * mu1, mu2 * mu2, mu1 * mu2
    sigma1_sq = _avg_pool3(img1 * img1) - mu1_sq
    sigma2_sq = _avg_pool3(img2 * img2) - mu2_sq
    sigma12 = _avg_pool3(img1 * img2) - mu1_mu2
    ssim_map = ((2 * mu1_mu2 + C1) * (2 * sigma12 + C2)) / (
        (mu1_sq + mu2_sq + C1) * (sigma1_sq + sigma2_sq + C2)
    )
    return jnp.mean(ssim_map)


def psnr(pred: jnp.ndarray, gt: jnp.ndarray) -> jnp.ndarray:
    mse = jnp.mean((pred - gt) ** 2)
    return jnp.where(mse < 1e-10, 100.0, -10.0 * jnp.log10(jnp.maximum(mse, 1e-10)))


def photometric_loss(rendered: jnp.ndarray, gt: jnp.ndarray,
                     lambda_dssim: float, dtype: str = "float32"):
    """(1-λ)·L1 + λ·(1-SSIM) on straight-through-clamped render.
    Returns (loss, metrics dict).

    ``dtype="bfloat16"`` runs the L1/SSIM image math in bf16 with f32
    scalars — the AMP-analog experiment (reference trains under autocast,
    ``trainer.py:31,468,505-511``). The loss maps are elementwise over
    (H, W, 3); the final means and the returned loss are f32. PSNR is
    always computed in f32 (it is a metric, not part of the objective)."""
    r = stclamp(rendered)
    if dtype == "bfloat16":
        rb = r.astype(jnp.bfloat16)
        gb = gt.astype(jnp.bfloat16)
        l1 = jnp.mean(jnp.abs(rb - gb).astype(jnp.float32))
        s = ssim(rb, gb).astype(jnp.float32)
    else:
        l1 = jnp.mean(jnp.abs(r - gt))
        s = ssim(r, gt)
    loss = (1.0 - lambda_dssim) * l1 + lambda_dssim * (1.0 - s)
    return loss, {
        "l1": l1,
        "ssim": s,
        "psnr": psnr(jnp.clip(rendered.astype(jnp.float32), 0.0, 1.0),
                     gt.astype(jnp.float32)),
    }


def scale_ratio_reg(log_scales: jnp.ndarray, alive: jnp.ndarray,
                    max_ratio: float, weight: float) -> jnp.ndarray:
    """Splatfacto-style anisotropy hinge (reference ``trainer.py:434-445``):
    penalize max/min scale ratio above ``max_ratio``, averaged over alive
    gaussians."""
    scales = scale_activation(log_scales)
    ratio = jnp.max(scales, axis=-1) / jnp.clip(jnp.min(scales, axis=-1), 1e-8)
    hinge = jnp.maximum(ratio, max_ratio) - max_ratio
    alive_f = alive.astype(log_scales.dtype)
    mean_hinge = jnp.sum(hinge * alive_f) / jnp.maximum(jnp.sum(alive_f), 1.0)
    return weight * mean_hinge
