"""Tests for the screen-space projection of 3D gaussians."""

import jax
import jax.numpy as jnp
import numpy as np

from gaussian_splatting_tpu.core.cameras import look_at, make_intrinsics
from gaussian_splatting_tpu.ops.projection import compute_cov3d, project_gaussians


def _center_camera(width=64, height=64, f=100.0, z=5.0):
    view = jnp.eye(4, dtype=jnp.float32)  # camera at origin looking +z
    K = make_intrinsics(width, height, focal_px=f)
    return view, K


def test_isotropic_gaussian_center():
    """An isotropic gaussian on the optical axis projects to the principal
    point with conic = (z/(f*s))^2 * I (plus the 0.3px blur)."""
    width = height = 64
    f, z, s = 100.0, 5.0, 0.1
    view, K = _center_camera(width, height, f, z)
    means = jnp.array([[0.0, 0.0, z]])
    quats = jnp.array([[1.0, 0.0, 0.0, 0.0]])
    scales = jnp.full((1, 3), s)
    out = project_gaussians(means, quats, scales, view, K, width, height)

    np.testing.assert_allclose(np.asarray(out.means2d[0]), [width / 2, height / 2], atol=1e-4)
    np.testing.assert_allclose(float(out.depths[0]), z, rtol=1e-6)
    var2d = (f * s / z) ** 2 + 0.3
    np.testing.assert_allclose(np.asarray(out.conics[0]), [1 / var2d, 0.0, 1 / var2d], rtol=1e-4, atol=1e-7)
    expected_radius = np.ceil(3 * np.sqrt(var2d))
    assert int(out.radii[0]) == int(expected_radius)


def test_cov3d_matches_numpy(rng):
    q = jnp.asarray(rng.normal(size=(32, 4)), dtype=jnp.float32)
    s = jnp.asarray(rng.uniform(0.05, 1.0, size=(32, 3)), dtype=jnp.float32)
    cov = np.asarray(compute_cov3d(q, s))
    # Symmetric PSD with det = prod(s^2).
    np.testing.assert_allclose(cov, np.swapaxes(cov, 1, 2), atol=1e-5)
    det = np.linalg.det(cov)
    np.testing.assert_allclose(det, np.asarray(jnp.prod(s**2, axis=1)), rtol=1e-3)


def test_behind_camera_culled():
    width = height = 64
    view, K = _center_camera()
    means = jnp.array([[0.0, 0.0, -5.0], [0.0, 0.0, 5.0]])
    quats = jnp.tile(jnp.array([[1.0, 0.0, 0.0, 0.0]]), (2, 1))
    scales = jnp.full((2, 3), 0.1)
    out = project_gaussians(means, quats, scales, view, K, width, height)
    assert int(out.radii[0]) == 0
    assert int(out.radii[1]) > 0


def test_offscreen_culled():
    width = height = 64
    view, K = _center_camera()
    means = jnp.array([[100.0, 0.0, 5.0]])  # far outside the frustum
    quats = jnp.array([[1.0, 0.0, 0.0, 0.0]])
    scales = jnp.full((1, 3), 0.01)
    out = project_gaussians(means, quats, scales, view, K, width, height)
    assert int(out.radii[0]) == 0


def test_projection_rotation_invariance_isotropic(rng):
    """For an isotropic gaussian, the projected conic is independent of the
    quaternion."""
    width = height = 64
    view, K = _center_camera()
    means = jnp.array([[0.3, -0.2, 4.0]])
    scales = jnp.full((1, 3), 0.2)
    qs = jnp.asarray(rng.normal(size=(8, 4)), dtype=jnp.float32)
    conics = []
    for i in range(8):
        out = project_gaussians(means, qs[i : i + 1], scales, view, K, width, height)
        conics.append(np.asarray(out.conics[0]))
    conics = np.stack(conics)
    np.testing.assert_allclose(conics, conics[0:1].repeat(8, 0), rtol=1e-4, atol=1e-6)


def test_projection_differentiable():
    width = height = 64
    view, K = _center_camera()

    def loss(means, quats, scales):
        out = project_gaussians(means, quats, scales, view, K, width, height)
        return jnp.sum(out.means2d) + jnp.sum(out.conics)

    g = jax.grad(loss, argnums=(0, 1, 2))(
        jnp.array([[0.1, 0.2, 5.0]]),
        jnp.array([[0.9, 0.1, 0.3, 0.0]]),
        jnp.full((1, 3), 0.2),
    )
    for gi in g:
        assert np.isfinite(np.asarray(gi)).all()
    # mean x moves pixel x by fx/z.
    gm = np.asarray(g[0])
    np.testing.assert_allclose(gm[0, 0], 100.0 / 5.0, rtol=1e-3)


def test_opacity_aware_radius_exact(rng):
    """Radius shrinks to sqrt(2 ln(255 op)) sigma for low opacities — and the
    rendered image + gradients are IDENTICAL (support outside can never pass
    the 1/255 alpha gate)."""
    import numpy as np
    from gaussian_splatting_tpu.ops.rasterize_ref import rasterize_reference

    width = height = 64
    view, K = _center_camera()
    n = 30
    means = jnp.asarray(rng.normal(size=(n, 3)) * np.array([1, 1, 0.3]) +
                        np.array([0, 0, 5.0]), jnp.float32)
    quats = jnp.asarray(rng.normal(size=(n, 4)), jnp.float32)
    scales = jnp.asarray(rng.uniform(0.2, 0.5, size=(n, 3)), jnp.float32)
    opac = jnp.asarray(rng.uniform(0.01, 0.9, size=(n,)), jnp.float32)

    p3 = project_gaussians(means, quats, scales, view, K, width, height)
    po = project_gaussians(means, quats, scales, view, K, width, height,
                           opacities=opac)
    r3 = np.asarray(p3.radii)
    ro = np.asarray(po.radii)
    assert (ro <= r3).all()
    low = np.asarray(opac) < 0.1
    vis = r3 > 0
    assert (ro[low & vis] < r3[low & vis]).all(), "low-opacity radii must shrink"

    # Identical render with either radius (the shrunken support is exact).
    colors = jnp.asarray(rng.uniform(size=(n, 3)), jnp.float32)
    img3 = rasterize_reference(p3.means2d, p3.conics, colors, opac, p3.depths,
                               p3.radii, width, height, tile_size=16).image
    imgo = rasterize_reference(po.means2d, po.conics, colors, opac, po.depths,
                               po.radii, width, height, tile_size=16).image
    np.testing.assert_allclose(np.asarray(imgo), np.asarray(img3), atol=1e-7)


def test_antialiased_mode_applies_compensation(rng):
    """rasterize_mode="antialiased" multiplies opacity by the covariance
    compensation sqrt(det_orig/det_blurred) (gsplat antialiased parity);
    classic mode ignores it (reference default, gsplat_backend.py:83-97).
    The compensation must be differentiable through to log_scales."""
    from gaussian_splatting_tpu.ops.render import render

    width = height = 64
    view, K = _center_camera()
    n = 20
    means = jnp.asarray(rng.normal(size=(n, 3)) * np.array([1, 1, 0.3]) +
                        np.array([0, 0, 5.0]), jnp.float32)
    quats = jnp.asarray(rng.normal(size=(n, 4)), jnp.float32)
    # Small scales -> eps2d blur dominates -> compensation well below 1.
    log_scales = jnp.asarray(np.log(rng.uniform(0.005, 0.02, size=(n, 3))),
                             jnp.float32)
    logit_op = jnp.asarray(rng.normal(size=(n, 1)) + 2.0, jnp.float32)
    sh = jnp.asarray(rng.normal(size=(n, 1, 3)) * 0.3, jnp.float32)

    out_c = render(means, quats, log_scales, logit_op, sh, view, K,
                   width, height, sh_degree=0, backend="ref")
    out_a = render(means, quats, log_scales, logit_op, sh, view, K,
                   width, height, sh_degree=0, backend="ref",
                   rasterize_mode="antialiased")
    a_c = np.asarray(out_c.alpha)
    a_a = np.asarray(out_a.alpha)
    assert a_a.max() > 0.01, "antialiased render must still be visible"
    assert (a_a <= a_c + 1e-6).all(), "compensation <= 1 can only dim"
    assert a_a.sum() < 0.98 * a_c.sum(), "tiny splats must be dimmed"

    def total_alpha(ls):
        return jnp.sum(render(means, quats, ls, logit_op, sh, view, K,
                              width, height, sh_degree=0, backend="ref",
                              rasterize_mode="antialiased").alpha)

    g = np.asarray(jax.grad(total_alpha)(log_scales))
    assert np.isfinite(g).all() and np.abs(g).max() > 0, \
        "compensation must carry gradient to scales"
