"""Camera pose refinement: se(3) exp-map unit tests and an end-to-end
recovery test (perturbed camera poses are pulled back toward ground truth by
the photometric loss while the gaussians are frozen).

The reference never refines its SfM poses (reference trainer call stack
SURVEY §3.3) — this is a capability extension; its correctness oracle is
the known synthetic perturbation."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gaussian_splatting_tpu.core.cameras import look_at, make_intrinsics
from gaussian_splatting_tpu.core.se3 import (
    apply_pose_delta,
    se3_exp,
    se3_log_rot_angle,
)
from gaussian_splatting_tpu.core.sh import rgb_to_sh0
from gaussian_splatting_tpu.models.gaussians import GaussianParams, empty_state
from gaussian_splatting_tpu.ops.render import render
from gaussian_splatting_tpu.training.config import TrainingConfig
from gaussian_splatting_tpu.training.optimizer import adam_init
from gaussian_splatting_tpu.training.step import (
    TrainState,
    ViewBatch,
    make_train_step,
    pose_state_init,
)


@pytest.fixture
def rng():
    return np.random.default_rng(7)


def test_se3_exp_identity_and_known_rotation():
    eye4 = np.eye(4, dtype=np.float32)
    np.testing.assert_allclose(
        np.asarray(se3_exp(jnp.zeros((6,), jnp.float32))), eye4, atol=1e-7)

    # Pure z-rotation by 90 degrees.
    xi = jnp.asarray([0.0, 0.0, np.pi / 2, 0.0, 0.0, 0.0], jnp.float32)
    T = np.asarray(se3_exp(xi))
    expected_R = np.asarray([[0, -1, 0], [1, 0, 0], [0, 0, 1]], np.float32)
    np.testing.assert_allclose(T[:3, :3], expected_R, atol=1e-6)
    np.testing.assert_allclose(T[:3, 3], 0.0, atol=1e-7)

    # Pure translation.
    xi = jnp.asarray([0.0, 0.0, 0.0, 1.0, -2.0, 3.0], jnp.float32)
    T = np.asarray(se3_exp(xi))
    np.testing.assert_allclose(T[:3, :3], np.eye(3), atol=1e-7)
    np.testing.assert_allclose(T[:3, 3], [1.0, -2.0, 3.0], atol=1e-6)


def test_se3_exp_inverse_and_batch(rng):
    xi = jnp.asarray(rng.normal(size=(5, 6)) * 0.3, jnp.float32)
    T = np.asarray(se3_exp(xi))            # (5, 4, 4)
    Tinv = np.asarray(se3_exp(-xi))
    prod = np.einsum("nij,njk->nik", T, Tinv)
    np.testing.assert_allclose(prod, np.tile(np.eye(4), (5, 1, 1)), atol=1e-5)
    # Rotation blocks are orthonormal.
    R = T[:, :3, :3]
    np.testing.assert_allclose(
        np.einsum("nij,nkj->nik", R, R), np.tile(np.eye(3), (5, 1, 1)),
        atol=1e-5)


def test_se3_exp_gradient_finite_at_zero():
    """The small-angle Taylor branch must give finite (and correct) grads at
    exactly zero — that's where every refinement starts."""
    def f(xi):
        return jnp.sum(se3_exp(xi) ** 2)

    g = np.asarray(jax.grad(f)(jnp.zeros((6,), jnp.float32)))
    assert np.isfinite(g).all()
    # d/d_tx of sum(T^2) at identity: T[0,3] = tx -> grad 2*tx = 0; but the
    # rotation part couples: check against numerical differences.
    eps = 1e-3
    for i in range(6):
        xi = np.zeros((6,), np.float32)
        xi[i] = eps
        fp = float(f(jnp.asarray(xi)))
        xi[i] = -eps
        fm = float(f(jnp.asarray(xi)))
        np.testing.assert_allclose(g[i], (fp - fm) / (2 * eps), atol=1e-3)


def _gt_scene(rng, n_views=4, width=48, height=48, n_gauss=40):
    """Ground-truth gaussians + oracle renders from known poses."""
    means = rng.normal(size=(n_gauss, 3)).astype(np.float32) * 0.6
    quats = np.tile([1.0, 0, 0, 0], (n_gauss, 1)).astype(np.float32)
    log_scales = np.log(rng.uniform(0.08, 0.25, size=(n_gauss, 3))).astype(np.float32)
    logit_op = np.full((n_gauss, 1), 2.0, np.float32)
    sh = np.concatenate([
        np.asarray(rgb_to_sh0(
            rng.uniform(0.1, 0.9, size=(n_gauss, 1, 3)).astype(np.float32))),
        np.zeros((n_gauss, 15, 3), np.float32)], axis=1)
    params = GaussianParams(
        means=jnp.asarray(means), quats=jnp.asarray(quats),
        log_scales=jnp.asarray(log_scales),
        logit_opacities=jnp.asarray(logit_op),
        features_dc=jnp.asarray(sh[:, :1]),
        features_rest=jnp.asarray(sh[:, 1:]),
    )
    K = make_intrinsics(width, height, focal_px=52.0)
    vms, images = [], []
    for i in range(n_views):
        ang = 2 * np.pi * i / n_views
        vm = look_at(eye=(2.5 * np.sin(ang), 0.4, -2.5 * np.cos(ang)),
                     target=(0, 0, 0))
        out = render(params.means, params.quats, params.log_scales,
                     params.logit_opacities, params.sh_coeffs, vm, K,
                     width, height, sh_degree=0, backend="ref", tile_size=16)
        vms.append(np.asarray(vm))
        images.append(np.clip(np.asarray(out.render), 0, 1))
    return params, np.asarray(K), np.stack(vms), np.stack(images)


@pytest.mark.slow
def test_pose_refinement_recovers_perturbation(rng):
    """Freeze the (ground-truth) gaussians, perturb every camera pose by a
    known se(3) twist, and let the pose optimizer pull them back: the loss
    must collapse and the geodesic rotation error must shrink well below the
    injected perturbation."""
    n_views = 4
    params, K, vms_true, images = _gt_scene(rng, n_views=n_views)

    xi_true = rng.normal(size=(n_views, 6)).astype(np.float32)
    xi_true[:, :3] *= 0.025   # ~1.4 deg rotations
    xi_true[:, 3:] *= 0.04
    vms_pert = np.asarray(se3_exp(jnp.asarray(xi_true))) @ vms_true

    gauss = dataclasses.replace(
        empty_state(params.means.shape[0]), params=params,
        alive=jnp.ones((params.means.shape[0],), bool))

    cfg = TrainingConfig(
        batch_size=n_views, backend="ref",
        # Freeze the gaussians: pose-only optimization.
        position_lr_init=1e-20, position_lr_final=1e-20,
        lr_rotation=0.0, lr_scaling=0.0, lr_opacity=0.0,
        lr_features_dc=0.0, lr_features_rest=0.0,
        scale_reg_weight=0.0,
        optimize_poses=True, pose_lr_init=3e-3, pose_lr_final=3e-3,
        pose_start_iter=0,
    )
    state = TrainState(
        gauss=gauss, opt=adam_init(gauss.params),
        iteration=jnp.zeros((), jnp.int32),
        poses=pose_state_init(n_views),
    )
    step = make_train_step(cfg, 48, 48, 0, "ref", 2.0, donate=False)
    batch = ViewBatch(
        images=jnp.asarray(images, jnp.float32),
        viewmats=jnp.asarray(vms_pert),
        Ks=jnp.asarray(np.tile(K[None], (n_views, 1, 1))),
        view_idx=jnp.arange(n_views, dtype=jnp.int32),
    )
    losses = []
    for _ in range(250):
        state, m = step(state, batch)
        losses.append(float(m["loss"]))
    assert losses[-1] < 0.25 * losses[0], (losses[0], losses[-1])

    # Learned correction composed with the perturbation ~ identity.
    vm_fixed = np.asarray(jax.vmap(apply_pose_delta)(
        jnp.asarray(vms_pert), state.poses.deltas))
    err_before = np.asarray(se3_log_rot_angle(
        jnp.asarray(vms_pert[:, :3, :3] @ vms_true[:, :3, :3].transpose(0, 2, 1)))
    )
    err_after = np.asarray(se3_log_rot_angle(
        jnp.asarray(vm_fixed[:, :3, :3] @ vms_true[:, :3, :3].transpose(0, 2, 1)))
    )
    assert err_after.mean() < 0.4 * err_before.mean(), (err_before, err_after)


def test_val_pose_alignment_recovers_perturbed_view(rng):
    """Test-time pose alignment (config.val_pose_align_steps): rendering a
    ground-truth scene from a perturbed camera must score much higher PSNR
    after the alignment loop than before (BARF/CamP eval protocol)."""
    from gaussian_splatting_tpu.training.trainer import GaussianTrainer

    params, K, vms_true, images = _gt_scene(rng, n_views=1)
    xi = jnp.asarray([0.015, -0.01, 0.02, 0.03, -0.02, 0.01], jnp.float32)
    vm_pert = np.asarray(se3_exp(xi)) @ vms_true[0]

    cfg = TrainingConfig(backend="ref", optimize_poses=True,
                         val_pose_align_steps=120, val_pose_align_lr=3e-3)
    trainer = GaussianTrainer(cfg)
    trainer.backend = "ref"
    render_one, metrics_one, align_one = trainer._val_render_fn(0, 48, 48, 40)
    assert align_one is not None

    masked_op = params.logit_opacities
    gt = jnp.asarray(images[0], jnp.float32)
    img_before = render_one(params, masked_op, jnp.asarray(vm_pert), jnp.asarray(K))
    _, _, psnr_before = metrics_one(img_before, gt)
    vm_fixed = align_one(params, masked_op, jnp.asarray(vm_pert),
                         jnp.asarray(K), gt)
    img_after = render_one(params, masked_op, vm_fixed, jnp.asarray(K))
    _, _, psnr_after = metrics_one(img_after, gt)
    assert float(psnr_after) > float(psnr_before) + 6.0, (
        float(psnr_before), float(psnr_after))
    # And the recovered extrinsics are closer to the truth.
    err_before = float(se3_log_rot_angle(
        jnp.asarray(vm_pert[:3, :3] @ vms_true[0][:3, :3].T)))
    err_after = float(se3_log_rot_angle(
        jnp.asarray(np.asarray(vm_fixed)[:3, :3] @ vms_true[0][:3, :3].T)))
    assert err_after < 0.5 * err_before, (err_before, err_after)


def test_pose_refinement_off_keeps_signature(rng):
    """With optimize_poses off (the default), a batch carrying view_idx and
    a state without poses runs the unmodified step."""
    params, K, vms, images = _gt_scene(rng, n_views=2)
    gauss = dataclasses.replace(
        empty_state(params.means.shape[0]), params=params,
        alive=jnp.ones((params.means.shape[0],), bool))
    cfg = TrainingConfig(batch_size=2, backend="ref")
    state = TrainState(gauss=gauss, opt=adam_init(gauss.params),
                       iteration=jnp.zeros((), jnp.int32))
    step = make_train_step(cfg, 48, 48, 0, "ref", 2.0, donate=False)
    batch = ViewBatch(images=jnp.asarray(images, jnp.float32),
                      viewmats=jnp.asarray(vms),
                      Ks=jnp.asarray(np.tile(K[None], (2, 1, 1))),
                      view_idx=jnp.arange(2, dtype=jnp.int32))
    state, m = step(state, batch)
    assert np.isfinite(float(m["loss"]))
    assert state.poses is None
