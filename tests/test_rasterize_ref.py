"""Oracle rasterizer vs an independent sequential NumPy implementation, plus
analytic and gradient checks."""

import pytest
import jax
import jax.numpy as jnp
import numpy as np

from gaussian_splatting_tpu.core.cameras import look_at, make_intrinsics
from gaussian_splatting_tpu.core.sh import rgb_to_sh0
from gaussian_splatting_tpu.ops.projection import project_gaussians
from gaussian_splatting_tpu.ops.rasterize_ref import blend_weights, rasterize_reference
from gaussian_splatting_tpu.ops.render import render

from np_reference import rasterize_np


def _random_screen_gaussians(rng, n, width, height):
    means2d = rng.uniform([0, 0], [width, height], size=(n, 2))
    # Random SPD conics from random 2x2 covariance.
    L = rng.normal(size=(n, 2, 2)) * 2.0
    cov = L @ np.swapaxes(L, 1, 2) + np.eye(2)[None] * 1.0
    inv = np.linalg.inv(cov)
    conics = np.stack([inv[:, 0, 0], inv[:, 0, 1], inv[:, 1, 1]], axis=1)
    colors = rng.uniform(size=(n, 3))
    opac = rng.uniform(0.2, 1.0, size=(n,))
    depths = rng.uniform(1.0, 10.0, size=(n,))
    lam_max = np.linalg.eigvalsh(cov).max(axis=1)
    radii = np.ceil(3 * np.sqrt(lam_max)).astype(np.int32)
    return (means2d.astype(np.float32), conics.astype(np.float32),
            colors.astype(np.float32), opac.astype(np.float32),
            depths.astype(np.float32), radii)


def test_single_gaussian_analytic():
    """One isotropic screen gaussian: the pixel at its center must blend
    exactly alpha = opacity (sigma = 0) and color = alpha * c."""
    width = height = 17
    means2d = jnp.array([[8.5, 8.5]])  # exactly a pixel center
    conics = jnp.array([[0.25, 0.0, 0.25]])  # var = 4
    colors = jnp.array([[1.0, 0.5, 0.25]])
    opac = jnp.array([0.8])
    depths = jnp.array([5.0])
    radii = jnp.array([6], dtype=jnp.int32)
    out = rasterize_reference(means2d, conics, colors, opac, depths, radii, width, height, tile_size=None)
    np.testing.assert_allclose(np.asarray(out.image[8, 8]), 0.8 * np.array([1.0, 0.5, 0.25]), rtol=1e-5)
    np.testing.assert_allclose(float(out.alpha[8, 8]), 0.8, rtol=1e-5)
    # One pixel away: alpha = 0.8 * exp(-0.5 * 0.25)
    expected = 0.8 * np.exp(-0.5 * 0.25)
    np.testing.assert_allclose(float(out.alpha[8, 9]), expected, rtol=1e-5)


def test_matches_numpy_sequential(rng):
    width = height = 24
    args = _random_screen_gaussians(rng, 60, width, height)
    ref_img, ref_alpha, ref_depth = rasterize_np(*args, width, height)
    out = rasterize_reference(*[jnp.asarray(a) for a in args], width, height, tile_size=None)
    np.testing.assert_allclose(np.asarray(out.image), ref_img, atol=2e-5)
    np.testing.assert_allclose(np.asarray(out.alpha), ref_alpha, atol=2e-5)
    np.testing.assert_allclose(np.asarray(out.depth), ref_depth, atol=1e-4)


def test_matches_numpy_tiled(rng):
    """Tile-binned path (radius bbox culling) bit-matches the sequential loop."""
    width, height = 32, 16
    args = _random_screen_gaussians(rng, 40, width, height)
    ref_img, ref_alpha, _ = rasterize_np(*args, width, height, tile_size=8)
    out = rasterize_reference(*[jnp.asarray(a) for a in args], width, height, tile_size=8)
    np.testing.assert_allclose(np.asarray(out.image), ref_img, atol=2e-5)
    np.testing.assert_allclose(np.asarray(out.alpha), ref_alpha, atol=2e-5)


def test_early_termination_matches(rng):
    """Stacked near-opaque gaussians exercise the T <= 1e-4 break."""
    width = height = 8
    n = 30
    means2d = np.full((n, 2), 4.0, np.float32) + rng.normal(size=(n, 2)).astype(np.float32) * 0.3
    conics = np.tile(np.array([[0.5, 0.0, 0.5]], np.float32), (n, 1))
    colors = rng.uniform(size=(n, 3)).astype(np.float32)
    opac = np.full((n,), 0.95, np.float32)
    depths = rng.uniform(1, 5, size=(n,)).astype(np.float32)
    radii = np.full((n,), 5, np.int32)
    args = (means2d, conics, colors, opac, depths, radii)
    ref_img, ref_alpha, _ = rasterize_np(*args, width, height)
    out = rasterize_reference(*[jnp.asarray(a) for a in args], width, height, tile_size=None)
    np.testing.assert_allclose(np.asarray(out.image), ref_img, atol=3e-5)
    np.testing.assert_allclose(np.asarray(out.alpha), ref_alpha, atol=3e-5)
    assert float(out.alpha.max()) > 0.999  # early stop actually hit


def test_background_blend():
    width = height = 4
    means2d = jnp.array([[100.0, 100.0]])  # contributes nothing
    conics = jnp.array([[1.0, 0.0, 1.0]])
    colors = jnp.array([[1.0, 0.0, 0.0]])
    out = rasterize_reference(
        means2d, conics, colors, jnp.array([0.9]), jnp.array([1.0]),
        jnp.array([3], jnp.int32), width, height,
        bg=jnp.array([0.2, 0.4, 0.6]), tile_size=None,
    )
    np.testing.assert_allclose(
        np.asarray(out.image), np.tile([0.2, 0.4, 0.6], (4, 4, 1)), atol=1e-6
    )


def test_blend_weights_grad_finite_difference(rng):
    alpha0 = rng.uniform(0.05, 0.6, size=(3, 10)).astype(np.float64)

    def f(a):
        w, T = blend_weights(jnp.asarray(a))
        return jnp.sum(w * jnp.arange(10)[None, :]) + jnp.sum(T**2)

    g = np.asarray(jax.grad(lambda a: f(a))(jnp.asarray(alpha0, jnp.float32)))
    eps = 1e-4
    for (i, j) in [(0, 0), (1, 5), (2, 9), (0, 3)]:
        ap = alpha0.copy(); ap[i, j] += eps
        am = alpha0.copy(); am[i, j] -= eps
        fd = (float(f(jnp.asarray(ap, jnp.float32))) - float(f(jnp.asarray(am, jnp.float32)))) / (2 * eps)
        np.testing.assert_allclose(g[i, j], fd, rtol=2e-2, atol=1e-4)


@pytest.mark.slow
def test_full_render_grad_finite_difference(rng):
    """End-to-end: grads of a scalar loss w.r.t. 3D means/scales/quats/opacity/SH
    match central finite differences."""
    width = height = 16
    view = look_at(eye=(0.0, 0.0, -4.0), target=(0.0, 0.0, 0.0))
    K = make_intrinsics(width, height, focal_px=30.0)
    n = 5
    means = rng.normal(size=(n, 3)).astype(np.float32) * 0.5
    quats = rng.normal(size=(n, 4)).astype(np.float32)
    log_scales = np.log(rng.uniform(0.2, 0.5, size=(n, 3))).astype(np.float32)
    logit_op = rng.normal(size=(n, 1)).astype(np.float32)
    sh = np.concatenate(
        [rgb_to_sh0(jnp.asarray(rng.uniform(size=(n, 1, 3)), jnp.float32)),
         jnp.zeros((n, 3, 3))], axis=1
    ).astype(np.float32)
    target = rng.uniform(size=(height, width, 3)).astype(np.float32)

    def loss(means, quats, log_scales, logit_op, sh):
        out = render(means, quats, log_scales, logit_op, sh, view, K,
                     width, height, sh_degree=1, backend="ref", tile_size=None)
        return jnp.mean((out.render - target) ** 2)

    args = [jnp.asarray(a) for a in (means, quats, log_scales, logit_op, sh)]
    grads = jax.grad(loss, argnums=tuple(range(5)))(*args)
    eps = 3e-3
    checks = [(0, (1, 0)), (0, (2, 2)), (1, (0, 1)), (2, (3, 0)), (3, (4, 0)), (4, (0, 0, 1))]
    raw = [means, quats, log_scales, logit_op, sh]
    for argi, idx in checks:
        ap = [a.copy() for a in raw]
        am = [a.copy() for a in raw]
        ap[argi][idx] += eps
        am[argi][idx] -= eps
        fp = float(loss(*[jnp.asarray(a) for a in ap]))
        fm = float(loss(*[jnp.asarray(a) for a in am]))
        fd = (fp - fm) / (2 * eps)
        an = float(np.asarray(grads[argi])[idx])
        # atol covers f32 finite-difference noise plus the discrete radius
        # ceil()/tile-mask boundaries that perturbation can cross.
        np.testing.assert_allclose(an, fd, rtol=5e-2, atol=3e-4)
