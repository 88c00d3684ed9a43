"""Training-layer tests: Adam parity vs torch, densify semantics, losses,
checkpoint + PLY roundtrips, and a tiny end-to-end convergence run."""

import pytest
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from gaussian_splatting_tpu.core.activations import opacity_activation, opacity_inverse_activation
from gaussian_splatting_tpu.core.cameras import look_at, make_intrinsics
from gaussian_splatting_tpu.core.sh import rgb_to_sh0
from gaussian_splatting_tpu.models.densify import clamp_scales, densify_and_prune, reset_opacity
from gaussian_splatting_tpu.models.gaussians import GaussianParams, empty_state, init_from_points
from gaussian_splatting_tpu.ops.render import render
from gaussian_splatting_tpu.training.checkpoint import load_checkpoint, save_checkpoint
from gaussian_splatting_tpu.training.config import TrainingConfig
from gaussian_splatting_tpu.training.export import export_state_ply, read_ply, write_ply
from gaussian_splatting_tpu.training.loss import photometric_loss, ssim, stclamp
from gaussian_splatting_tpu.training.optimizer import AdamState, adam_init, adam_update, group_lrs, xyz_lr_schedule
from gaussian_splatting_tpu.training.step import TrainState, ViewBatch, make_train_step
from gaussian_splatting_tpu.training.trainer import GaussianTrainer, ViewDataset, compute_scene_geometry


def _params(rng, n):
    return GaussianParams(
        means=jnp.asarray(rng.normal(size=(n, 3)), jnp.float32),
        quats=jnp.asarray(rng.normal(size=(n, 4)), jnp.float32),
        log_scales=jnp.asarray(rng.normal(size=(n, 3)) * 0.1 - 2, jnp.float32),
        logit_opacities=jnp.asarray(rng.normal(size=(n, 1)), jnp.float32),
        features_dc=jnp.asarray(rng.normal(size=(n, 1, 3)), jnp.float32),
        features_rest=jnp.asarray(rng.normal(size=(n, 15, 3)) * 0.1, jnp.float32),
    )


def test_adam_matches_torch(rng):
    """Our manual Adam == torch.optim.Adam with per-group LRs and eps=1e-15
    (the reference's optimizer setup, trainer.py:331-340)."""
    import torch

    cfg = TrainingConfig()
    n = 16
    params = _params(rng, n)
    grads_seq = [_params(rng, n) for _ in range(3)]

    tparams = {
        k: torch.tensor(np.asarray(getattr(params, k)), requires_grad=True)
        for k in ("means", "quats", "log_scales", "logit_opacities", "features_dc", "features_rest")
    }
    lr_map = {
        "means": cfg.position_lr_init, "quats": cfg.lr_rotation,
        "log_scales": cfg.lr_scaling, "logit_opacities": cfg.lr_opacity,
        "features_dc": cfg.lr_features_dc, "features_rest": cfg.lr_features_rest,
    }
    opt = torch.optim.Adam(
        [{"params": [tparams[k]], "lr": lr_map[k]} for k in tparams], eps=1e-15
    )

    state = adam_init(params)
    lrs = group_lrs(cfg, jnp.float32(cfg.position_lr_init))
    for g in grads_seq:
        params, state = adam_update(g, state, params, lrs, eps=cfg.adam_eps)
        for k in tparams:
            tparams[k].grad = torch.tensor(np.asarray(getattr(g, k)))
        opt.step()

    for k in tparams:
        np.testing.assert_allclose(
            np.asarray(getattr(params, k)), tparams[k].detach().numpy(),
            rtol=2e-4, atol=1e-6, err_msg=k,
        )


def test_xyz_lr_schedule():
    cfg = TrainingConfig()
    lr0 = float(xyz_lr_schedule(cfg, jnp.int32(0)))
    lr_end = float(xyz_lr_schedule(cfg, jnp.int32(cfg.position_lr_max_steps)))
    np.testing.assert_allclose(lr0, cfg.position_lr_init, rtol=1e-6)
    np.testing.assert_allclose(lr_end, cfg.position_lr_final, rtol=1e-5)


def test_stclamp_straight_through():
    x = jnp.array([-0.5, 0.5, 1.5])
    y = stclamp(x)
    np.testing.assert_allclose(np.asarray(y), [0.0, 0.5, 1.0])
    g = jax.grad(lambda v: jnp.sum(stclamp(v) * jnp.array([1.0, 2.0, 3.0])))(x)
    np.testing.assert_allclose(np.asarray(g), [1.0, 2.0, 3.0])


def test_ssim_matches_torch_avgpool(rng):
    """Reference SSIM uses 3x3 avg_pool2d with zero padding; match torch."""
    import torch
    import torch.nn.functional as F

    img1 = rng.uniform(size=(17, 23, 3)).astype(np.float32)
    img2 = rng.uniform(size=(17, 23, 3)).astype(np.float32)

    def torch_ssim(a, b):
        a = torch.tensor(a).permute(2, 0, 1).unsqueeze(0)
        b = torch.tensor(b).permute(2, 0, 1).unsqueeze(0)
        C1, C2 = 0.01**2, 0.03**2
        mu1 = F.avg_pool2d(a, 3, 1, padding=1)
        mu2 = F.avg_pool2d(b, 3, 1, padding=1)
        s1 = F.avg_pool2d(a * a, 3, 1, padding=1) - mu1**2
        s2 = F.avg_pool2d(b * b, 3, 1, padding=1) - mu2**2
        s12 = F.avg_pool2d(a * b, 3, 1, padding=1) - mu1 * mu2
        m = ((2 * mu1 * mu2 + C1) * (2 * s12 + C2)) / ((mu1**2 + mu2**2 + C1) * (s1 + s2 + C2))
        return float(m.mean())

    ours = float(ssim(jnp.asarray(img1), jnp.asarray(img2)))
    np.testing.assert_allclose(ours, torch_ssim(img1, img2), rtol=1e-5)


def _densify_state(C=32):
    state = empty_state(C)
    p = state.params
    n = 8
    means = jnp.arange(n * 3, dtype=jnp.float32).reshape(n, 3) * 0.1
    p = dataclasses.replace(
        p,
        means=p.means.at[:n].set(means),
        logit_opacities=p.logit_opacities.at[:n].set(
            opacity_inverse_activation(jnp.full((n, 1), 0.5))),
    )
    state = dataclasses.replace(state, params=p, alive=state.alive.at[:n].set(True))
    return state, n


def test_densify_clone_and_split():
    state, n = _densify_state()
    C = state.capacity
    # gaussians 0,1: high grad + small scale -> clone; 2: high grad + large
    # scale -> split; others calm. scales: default log -3 (small).
    accum = state.xyz_grad_accum.at[0].set(1.0).at[1].set(1.0).at[2].set(1.0)
    count = state.xyz_grad_count + 1.0
    p = dataclasses.replace(
        state.params, log_scales=state.params.log_scales.at[2].set(jnp.log(0.5)))
    state = dataclasses.replace(state, params=p, xyz_grad_accum=accum, xyz_grad_count=count)

    moments = (jax.tree_util.tree_map(jnp.ones_like, state.params),
               jax.tree_util.tree_map(jnp.ones_like, state.params))
    extent = jnp.float32(1.0)  # clone threshold: max_scale <= 0.1; exp(-3)=0.0498 ok; 0.5 > 0.1 -> split
    new_state, (mu, nu), stats = densify_and_prune(
        state, moments, jax.random.PRNGKey(0),
        grads_threshold=5e-4, min_opacity=0.005, extent=extent,
        max_gaussians=1000,
    )
    assert int(stats.n_cloned) == 2
    assert int(stats.n_split) == 1
    assert int(stats.n_pruned) == 0
    assert int(stats.n_after) == n + 3  # +2 clones, +1 net from split

    alive = np.asarray(new_state.alive)
    assert alive.sum() == n + 3
    # Clones land in the first free slots with exact parameter copies.
    new_means = np.asarray(new_state.params.means)
    np.testing.assert_allclose(new_means[n], np.asarray(state.params.means)[0], atol=1e-6)
    np.testing.assert_allclose(new_means[n + 1], np.asarray(state.params.means)[1], atol=1e-6)
    # Clone slots have zeroed Adam moments; untouched slots keep theirs.
    mu_means = np.asarray(mu.means)
    assert (mu_means[n] == 0).all() and (mu_means[n + 1] == 0).all()
    assert (mu_means[3] == 1).all()
    # Split: parent slot 2 reused with scale/1.6 and zeroed moments.
    np.testing.assert_allclose(
        np.asarray(new_state.params.log_scales)[2],
        np.log(0.5) - np.log(1.6), atol=1e-5)
    assert (mu_means[2] == 0).all()
    # Grad accumulators reset.
    assert float(jnp.sum(new_state.xyz_grad_accum)) == 0.0


def test_densify_prune_low_opacity():
    state, n = _densify_state()
    p = dataclasses.replace(
        state.params,
        logit_opacities=state.params.logit_opacities.at[5].set(
            opacity_inverse_activation(jnp.full((1,), 1e-4))),
    )
    state = dataclasses.replace(state, params=p)
    moments = (jax.tree_util.tree_map(jnp.zeros_like, p),
               jax.tree_util.tree_map(jnp.zeros_like, p))
    new_state, _, stats = densify_and_prune(
        state, moments, jax.random.PRNGKey(0),
        grads_threshold=5e-4, min_opacity=0.005, extent=jnp.float32(1.0),
        max_gaussians=1000,
    )
    assert int(stats.n_pruned) == 1
    assert not bool(new_state.alive[5])


def test_densify_population_cap():
    state, n = _densify_state()
    accum = state.xyz_grad_accum.at[:n].set(
        jnp.arange(1, n + 1, dtype=jnp.float32)[:, None] * 0.01)
    state = dataclasses.replace(
        state, xyz_grad_accum=accum, xyz_grad_count=state.xyz_grad_count + 1.0)
    moments = (jax.tree_util.tree_map(jnp.zeros_like, state.params),
               jax.tree_util.tree_map(jnp.zeros_like, state.params))
    new_state, _, stats = densify_and_prune(
        state, moments, jax.random.PRNGKey(0),
        grads_threshold=5e-4, min_opacity=0.005, extent=jnp.float32(1.0),
        max_gaussians=n + 2,  # only 2 slots of growth allowed
    )
    assert bool(stats.capped)
    assert int(stats.n_after) <= n + 2
    # The kept candidates are the highest-gradient ones (slots 6, 7).
    assert int(stats.n_cloned) == 2


def test_densify_topk_fraction():
    """Rank-threshold densify selects the top fraction by grad norm
    regardless of absolute gradient scale (the 5e-4 absolute threshold
    would select nobody at this ~1e-5 scale)."""
    state, n = _densify_state()
    # Tiny, distinct gradient norms: slots 0..7 get (i+1) * 2e-6.
    accum = state.xyz_grad_accum.at[:n].set(
        jnp.arange(1, n + 1, dtype=jnp.float32)[:, None] * 2e-6)
    state = dataclasses.replace(
        state, xyz_grad_accum=accum, xyz_grad_count=state.xyz_grad_count + 1.0)
    moments = (jax.tree_util.tree_map(jnp.zeros_like, state.params),
               jax.tree_util.tree_map(jnp.zeros_like, state.params))

    # Absolute threshold: dead.
    _, _, s_abs = densify_and_prune(
        state, moments, jax.random.PRNGKey(0),
        grads_threshold=5e-4, min_opacity=0.005, extent=jnp.float32(1.0),
        max_gaussians=1000)
    assert int(s_abs.n_cloned) + int(s_abs.n_split) == 0

    # Top-25% rank threshold: exactly 2 of the 8 alive densify, and they
    # are the two highest-gradient slots (6, 7 -> clones; scales small).
    new_state, _, s_topk = densify_and_prune(
        state, moments, jax.random.PRNGKey(0),
        grads_threshold=5e-4, min_opacity=0.005, extent=jnp.float32(1.0),
        max_gaussians=1000, topk_fraction=0.25)
    assert int(s_topk.n_cloned) + int(s_topk.n_split) == 2
    new_means = np.asarray(new_state.params.means)
    np.testing.assert_allclose(new_means[n], np.asarray(state.params.means)[6],
                               atol=1e-6)
    np.testing.assert_allclose(new_means[n + 1],
                               np.asarray(state.params.means)[7], atol=1e-6)


def test_reset_opacity_and_clamp():
    state, n = _densify_state()
    p = reset_opacity(state.params)
    op = np.asarray(opacity_activation(p.logit_opacities))[:n]
    np.testing.assert_allclose(op, 0.01, rtol=1e-4)  # was 0.5, reset to 0.01

    p2 = clamp_scales(state.params, jnp.float32(1.0), 0.2)
    assert float(p2.log_scales.max()) <= np.log(0.2 + 1e-9) + 1e-6


def test_checkpoint_roundtrip(rng, tmp_path):
    state, n = _densify_state()
    ts = TrainState(
        gauss=state, opt=adam_init(state.params), iteration=jnp.int32(1234))
    path = str(tmp_path / "ck.npz")
    save_checkpoint(path, ts, extra={"scene_extent": 2.5})
    loaded, meta = load_checkpoint(path)
    assert int(loaded.iteration) == 1234
    assert meta["scene_extent"] == 2.5
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
        ts.gauss.params, loaded.gauss.params)
    np.testing.assert_array_equal(np.asarray(ts.gauss.alive), np.asarray(loaded.gauss.alive))


def test_ply_roundtrip(rng, tmp_path):
    n = 10
    p = _params(rng, n)
    path = str(tmp_path / "m.ply")
    write_ply(path, *[np.asarray(getattr(p, k)) for k in
                      ("means", "features_dc", "features_rest",
                       "logit_opacities", "log_scales", "quats")])
    back = read_ply(path)
    np.testing.assert_allclose(back["means"], np.asarray(p.means), atol=1e-6)
    np.testing.assert_allclose(back["features_rest"], np.asarray(p.features_rest), atol=1e-6)
    np.testing.assert_allclose(back["quats"], np.asarray(p.quats), atol=1e-6)
    with open(path, "rb") as f:
        head = f.read(64)
    assert head.startswith(b"ply\nformat binary_little_endian 1.0\n")


def _synthetic_scene(rng, n_views=6, width=32, height=32, n_gauss=30):
    """Ground-truth gaussians rendered with the oracle -> dataset."""
    gt_means = rng.normal(size=(n_gauss, 3)).astype(np.float32) * 0.6
    gt_quats = np.tile([1.0, 0, 0, 0], (n_gauss, 1)).astype(np.float32)
    gt_scales = np.log(rng.uniform(0.08, 0.25, size=(n_gauss, 3))).astype(np.float32)
    gt_op = np.full((n_gauss, 1), 2.0, np.float32)  # sigmoid ~ 0.88
    gt_sh = np.concatenate([
        np.asarray(rgb_to_sh0(rng.uniform(0.1, 0.9, size=(n_gauss, 1, 3)).astype(np.float32))),
        np.zeros((n_gauss, 15, 3), np.float32)], axis=1)
    K = make_intrinsics(width, height, focal_px=35.0)
    views, images = [], []
    for i in range(n_views):
        ang = 2 * np.pi * i / n_views
        eye = (2.5 * np.sin(ang), 0.4, -2.5 * np.cos(ang))
        vm = look_at(eye=eye, target=(0, 0, 0))
        out = render(
            jnp.asarray(gt_means), jnp.asarray(gt_quats), jnp.asarray(gt_scales),
            jnp.asarray(gt_op), jnp.asarray(gt_sh), vm, K, width, height,
            sh_degree=0, backend="ref", tile_size=16)
        img = np.clip(np.asarray(out.render), 0, 1)
        views.append(np.asarray(vm))
        images.append((img * 255).astype(np.uint8))
    ds = ViewDataset(
        images=np.stack(images), viewmats=np.stack(views),
        Ks=np.tile(np.asarray(K)[None], (n_views, 1, 1)))
    return ds, gt_means


def test_train_step_descends(rng):
    """A few jitted train steps reduce the loss on a synthetic scene."""
    ds, gt_means = _synthetic_scene(rng)
    cfg = TrainingConfig(batch_size=2, backend="ref")
    state0 = init_from_points(gt_means + rng.normal(size=gt_means.shape).astype(np.float32) * 0.05,
                              None, 64, capacity=128)
    ts = TrainState(gauss=state0, opt=adam_init(state0.params),
                    iteration=jnp.zeros((), jnp.int32))
    step = make_train_step(cfg, ds.width, ds.height, 0, "ref", 2.0, donate=False)
    batch = ViewBatch(
        images=jnp.asarray(ds.images[:2], jnp.float32) / 255.0,
        viewmats=jnp.asarray(ds.viewmats[:2]),
        Ks=jnp.asarray(ds.Ks[:2]))
    losses = []
    for _ in range(60):
        ts, m = step(ts, batch)
        losses.append(float(m["loss"]))
    # 3DGS learning rates are intentionally small; verify a steady descent.
    assert losses[-1] < losses[0] * 0.75, losses[::20]
    assert int(ts.iteration) == 60


@pytest.mark.slow
def test_trainer_end_to_end(rng, tmp_path):
    """Full trainer loop on a synthetic scene: loss falls, PSNR rises,
    checkpoints + final PLY written, resume works."""
    ds, gt_means = _synthetic_scene(rng, n_views=8)
    cfg = TrainingConfig(
        iterations=60, batch_size=2, backend="ref",
        initial_gaussians=60, max_gaussians=4096,
        densify_from_iteration=20, densify_interval=25,
        opacity_reset_interval=10_000,
        val_interval=30, checkpoint_interval=50, log_scalar_interval=10,
        sh_increment_interval=50, sh_degree_max=1,
    )
    trainer = GaussianTrainer(cfg)
    state = trainer.train(
        ds, str(tmp_path / "run"), points=gt_means, colors=None)
    assert int(state.iteration) == 60
    assert (tmp_path / "run" / "final.ply").exists()
    assert (tmp_path / "run" / "checkpoint_50.npz").exists()
    assert (tmp_path / "run" / "metrics.jsonl").exists()

    # Resume continues the iteration counter.
    cfg2 = cfg.replace(iterations=70)
    trainer2 = GaussianTrainer(cfg2)
    state2 = trainer2.train(
        ds, str(tmp_path / "run2"),
        points=gt_means, resume_from=str(tmp_path / "run" / "checkpoint_50.npz"))
    assert int(state2.iteration) == 70


def test_scene_geometry_outlier_filter():
    pts = np.concatenate([
        np.random.RandomState(0).normal(size=(100, 3)),
        np.array([[500.0, 0, 0]]),  # far outlier
    ])
    poses = [np.tile(np.eye(4)[None], (3, 1, 1))]
    poses[0][:, 2, 3] = 4.0
    extent, in_extent = compute_scene_geometry(pts, poses)
    assert np.isfinite(extent) and extent > 0
    assert not in_extent[-1]
    assert in_extent[:100].mean() > 0.9


def test_choose_max_tiles_adapts(rng):
    """Sparse clouds with big kNN scales get a bigger tile-footprint cap.
    The cap is chosen from EXACT clipped tile counts, so the image must have
    more than max_tiles_per_gaussian tiles for a raise to be possible."""
    from gaussian_splatting_tpu.training.trainer import GaussianTrainer

    ds, gt_means = _synthetic_scene(rng, n_views=3, width=128, height=128)
    cfg = TrainingConfig()
    # Big scales + real opacity -> big footprints. (Footprints are now
    # gate-ellipse windows, so they scale with ln(255*op): at the reference
    # init opacity 0.005 the above-gate region is genuinely ~1 tile.)
    st = init_from_points(gt_means, None, 64, capacity=128, init_opacity=0.5)
    st = dataclasses.replace(
        st, params=dataclasses.replace(
            st.params, log_scales=jnp.full_like(st.params.log_scales, jnp.log(0.8))))
    chosen = GaussianTrainer(cfg)._choose_max_tiles(
        TrainState(gauss=st, opt=adam_init(st.params), iteration=jnp.int32(0)),
        ds, cfg)
    assert chosen > cfg.max_tiles_per_gaussian
    assert chosen & (chosen - 1) == 0  # power of two
    # Tiny scales keep the default.
    st2 = dataclasses.replace(
        st, params=dataclasses.replace(
            st.params, log_scales=jnp.full_like(st.params.log_scales, jnp.log(0.01))))
    chosen2 = GaussianTrainer(cfg)._choose_max_tiles(
        TrainState(gauss=st2, opt=adam_init(st2.params), iteration=jnp.int32(0)),
        ds, cfg)
    assert chosen2 == cfg.max_tiles_per_gaussian


def test_tilecap_watchdog_raises_max_tiles(rng):
    """Persistent tile-cap overflow (n_dropped > half of kept
    intersections) must double max_tiles_per_gaussian and re-measure class
    budgets — the round-4 config-3 failure (90% of candidate intersections
    silently truncated at a fixed cap of 16, with no adaptive response)."""
    ds, gt_means = _synthetic_scene(rng, n_views=4)
    cfg = TrainingConfig(
        iterations=6, batch_size=1, backend="pallas",
        initial_gaussians=48, max_gaussians=512,
        init_opacity=0.6,
        densify_from_iteration=10_000, opacity_reset_interval=10_000,
        val_interval=10_000, checkpoint_interval=10_000,
        log_scalar_interval=1, sh_degree_max=0,
        # Force heavy truncation: cap of 1 tile per gaussian while the
        # scene's splats (huge kNN-init scales from a 48-point cloud)
        # cover many tiles each.
        max_tiles_per_gaussian=1, auto_max_tiles=False,
    )
    trainer = GaussianTrainer(cfg)
    import tempfile
    with tempfile.TemporaryDirectory() as td:
        trainer.train(ds, td, points=gt_means, colors=None)
    assert trainer.config.max_tiles_per_gaussian >= 2, (
        "tile-cap watchdog never fired")
