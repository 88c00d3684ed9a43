"""Unit tests for core math: quaternions, SH, cameras, activations."""

import jax
import jax.numpy as jnp
import numpy as np

from gaussian_splatting_tpu.core.quaternions import (
    quat_normalize,
    quat_to_rotmat,
    rotmat_to_quat,
)
from gaussian_splatting_tpu.core.sh import (
    SH_C0,
    eval_sh,
    num_sh_bases,
    rgb_to_sh0,
    sh0_to_rgb,
)
from gaussian_splatting_tpu.core.cameras import (
    Camera,
    look_at,
    make_intrinsics,
    projection_matrix,
)
from gaussian_splatting_tpu.core.activations import (
    opacity_activation,
    opacity_inverse_activation,
    scale_activation,
    scale_inverse_activation,
)


def test_quat_identity():
    q = jnp.array([[1.0, 0.0, 0.0, 0.0]])
    R = quat_to_rotmat(q)
    np.testing.assert_allclose(np.asarray(R[0]), np.eye(3), atol=1e-6)


def test_quat_rotmat_orthonormal(rng):
    q = jnp.asarray(rng.normal(size=(64, 4)), dtype=jnp.float32)
    R = quat_to_rotmat(quat_normalize(q))
    eye = jnp.einsum("nij,nkj->nik", R, R)
    np.testing.assert_allclose(np.asarray(eye), np.tile(np.eye(3), (64, 1, 1)), atol=1e-5)
    det = np.linalg.det(np.asarray(R))
    np.testing.assert_allclose(det, np.ones(64), atol=1e-5)


def test_quat_roundtrip(rng):
    q = quat_normalize(jnp.asarray(rng.normal(size=(128, 4)), dtype=jnp.float32))
    q = jnp.where(q[:, :1] < 0, -q, q)  # canonical sign
    R = quat_to_rotmat(q)
    q2 = rotmat_to_quat(R)
    np.testing.assert_allclose(np.asarray(q2), np.asarray(q), atol=1e-5)


def test_sh_degree0_constant(rng):
    coeffs = jnp.asarray(rng.normal(size=(16, 16, 3)), dtype=jnp.float32)
    d1 = jnp.array([[0.0, 0.0, 1.0]] * 16)
    d2 = jnp.array([[1.0, 0.0, 0.0]] * 16)
    c1 = eval_sh(0, coeffs, d1)
    c2 = eval_sh(0, coeffs, d2)
    np.testing.assert_allclose(np.asarray(c1), np.asarray(c2), atol=1e-6)
    np.testing.assert_allclose(np.asarray(c1), np.asarray(SH_C0 * coeffs[:, 0, :]), atol=1e-6)


def test_sh_bases_count():
    assert [num_sh_bases(d) for d in range(4)] == [1, 4, 9, 16]


def test_sh_orthogonality_montecarlo(rng):
    """SH bases of different index are orthogonal over the sphere; each basis
    has norm 1/(4pi) * integral(Y^2) = 1 -> mean(Y_i Y_j) ~ delta_ij / (4pi)."""
    n = 200_000
    v = rng.normal(size=(n, 3))
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    dirs = jnp.asarray(v, dtype=jnp.float32)
    # Evaluate each basis by one-hot coefficients.
    K = 16
    basis = []
    for k in range(K):
        coeffs = jnp.zeros((1, K, 3)).at[0, k, 0].set(1.0)
        y = eval_sh(3, jnp.broadcast_to(coeffs, (n, K, 3)), dirs)[:, 0]
        basis.append(np.asarray(y))
    B = np.stack(basis, axis=1)  # (n, 16)
    gram = B.T @ B / n
    expected = np.eye(K) / (4 * np.pi)
    np.testing.assert_allclose(gram, expected, atol=3e-3)


def test_rgb_sh0_roundtrip(rng):
    rgb = jnp.asarray(rng.uniform(size=(32, 3)), dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(sh0_to_rgb(rgb_to_sh0(rgb))), np.asarray(rgb), atol=1e-6)


def test_projection_matrix_matches_reference_layout():
    K = make_intrinsics(640, 480, focal_px=500.0)
    P = projection_matrix(K, 640, 480)
    P = np.asarray(P)
    assert P[0, 0] == np.float32(2 * 500.0 / 640)
    assert P[1, 1] == np.float32(2 * 500.0 / 480)
    assert P[3, 2] == 1.0
    znear, zfar = 0.01, 100.0
    np.testing.assert_allclose(P[2, 2], zfar / (zfar - znear), rtol=1e-6)
    np.testing.assert_allclose(P[2, 3], -(zfar * znear) / (zfar - znear), rtol=1e-6)


def test_camera_inverse_and_position():
    view = look_at(eye=(1.0, 2.0, 3.0), target=(0.0, 0.0, 0.0))
    cam = Camera(viewmat=view, K=make_intrinsics(64, 64), width=64, height=64)
    np.testing.assert_allclose(np.asarray(cam.position), [1.0, 2.0, 3.0], atol=1e-5)
    c2w = np.asarray(cam.cam_to_world)
    np.testing.assert_allclose(c2w @ np.asarray(view), np.eye(4), atol=1e-5)
    # look_at maps the target onto the +z axis.
    p = np.asarray(view) @ np.array([0.0, 0.0, 0.0, 1.0])
    np.testing.assert_allclose(p[:2], 0.0, atol=1e-6)
    assert p[2] > 0


def test_activations_roundtrip(rng):
    s = jnp.asarray(rng.uniform(0.01, 5.0, size=(16, 3)), dtype=jnp.float32)
    np.testing.assert_allclose(
        np.asarray(scale_activation(scale_inverse_activation(s))), np.asarray(s), rtol=1e-6
    )
    o = jnp.asarray(rng.uniform(0.01, 0.99, size=(16, 1)), dtype=jnp.float32)
    np.testing.assert_allclose(
        np.asarray(opacity_activation(opacity_inverse_activation(o))), np.asarray(o), rtol=1e-5
    )


def test_camera_is_pytree():
    view = look_at(eye=(0.0, 0.0, -3.0), target=(0.0, 0.0, 0.0))
    cam = Camera(viewmat=view, K=make_intrinsics(32, 32), width=32, height=32)
    leaves = jax.tree_util.tree_leaves(cam)
    assert len(leaves) == 2  # viewmat, K; width/height static

    @jax.jit
    def f(c):
        return c.position

    np.testing.assert_allclose(np.asarray(f(cam)), [0.0, 0.0, -3.0], atol=1e-5)
