"""Multi-chip sharding tests on the 8-device virtual CPU mesh: the sharded
train step compiles, runs, matches the single-chip step's loss, and descends."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gaussian_splatting_tpu.models.gaussians import init_from_points
from gaussian_splatting_tpu.parallel.mesh import make_mesh
from gaussian_splatting_tpu.parallel.sharded_step import (
    make_sharded_train_step,
    pad_images_for_bands,
)
from gaussian_splatting_tpu.training.config import TrainingConfig
from gaussian_splatting_tpu.training.optimizer import adam_init
from gaussian_splatting_tpu.training.step import TrainState, ViewBatch, make_train_step

from test_training import _synthetic_scene


def _setup(rng, n_views=4):
    ds, gt_means = _synthetic_scene(rng, n_views=n_views, width=32, height=32)
    state0 = init_from_points(
        gt_means + rng.normal(size=gt_means.shape).astype(np.float32) * 0.05,
        None, 64, capacity=128)
    ts = TrainState(gauss=state0, opt=adam_init(state0.params),
                    iteration=jnp.zeros((), jnp.int32))
    return ds, ts


def test_mesh_creation():
    assert len(jax.devices()) == 8, "conftest must provide 8 virtual devices"
    mesh = make_mesh(data=2, model=4)
    assert mesh.shape == {"data": 2, "model": 4}


@pytest.mark.slow
@pytest.mark.parametrize("dm", [(2, 4), (4, 2), (1, 8)])
def test_sharded_step_runs_and_descends(rng, dm):
    d, m = dm
    ds, ts = _setup(rng)
    cfg = TrainingConfig(batch_size=4, backend="ref")
    mesh = make_mesh(data=d, model=m)
    step, band_h, h_pad = make_sharded_train_step(
        cfg, mesh, ds.width, ds.height, 0, "ref", 2.0, donate=False)
    imgs = pad_images_for_bands(jnp.asarray(ds.images, jnp.float32) / 255.0, h_pad)
    batch = ViewBatch(images=imgs, viewmats=jnp.asarray(ds.viewmats),
                      Ks=jnp.asarray(ds.Ks))
    losses = []
    for _ in range(20):
        ts, metrics = step(ts, batch)
        losses.append(float(metrics["loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]


def test_sharded_matches_single_chip(rng):
    """Loss and one-step parameter update agree with the single-chip step
    (band-boundary SSIM windows excluded by construction at 32px/1 band...
    use model=2 so one interior boundary exists; tolerances cover it)."""
    ds, ts = _setup(rng)
    cfg = TrainingConfig(batch_size=2, backend="ref")
    mesh = make_mesh(data=2, model=2)
    sstep, band_h, h_pad = make_sharded_train_step(
        cfg, mesh, ds.width, ds.height, 0, "ref", 2.0, donate=False)
    step1 = make_train_step(cfg, ds.width, ds.height, 0, "ref", 2.0, donate=False)

    imgs = jnp.asarray(ds.images[:2], jnp.float32) / 255.0
    batch1 = ViewBatch(images=imgs, viewmats=jnp.asarray(ds.viewmats[:2]),
                       Ks=jnp.asarray(ds.Ks[:2]))
    batchN = ViewBatch(images=pad_images_for_bands(imgs, h_pad),
                       viewmats=jnp.asarray(ds.viewmats[:2]),
                       Ks=jnp.asarray(ds.Ks[:2]))

    ts1, m1 = step1(ts, batch1)
    tsN, mN = sstep(ts, batchN)
    # L1/PSNR exact; SSIM exact too since the 1-row halo exchange (round 1
    # zero-padded band boundaries and could only assert rtol=5e-3 here).
    np.testing.assert_allclose(float(mN["l1"]), float(m1["l1"]), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(float(mN["loss"]), float(m1["loss"]),
                               rtol=2e-6, atol=1e-7)
    # Parameter updates identical up to FP reduction-order noise in psum.
    for k in ("means", "log_scales", "features_dc"):
        a = np.asarray(getattr(ts1.gauss.params, k))
        b = np.asarray(getattr(tsN.gauss.params, k))
        err = np.abs(a - b).max()
        assert err < 1e-5, (k, err)


def test_zero_sharded_state_placement(rng):
    """ZeRO: after one sharded step, every leading-dim-C tensor (params,
    Adam moments, accumulators) is sharded over the model axis — per-chip
    shard bytes = 1/M of the global array."""
    ds, ts = _setup(rng)
    cfg = TrainingConfig(batch_size=2, backend="ref")
    mesh = make_mesh(data=2, model=4)
    sstep, _, h_pad = make_sharded_train_step(
        cfg, mesh, ds.width, ds.height, 0, "ref", 2.0, donate=False)
    imgs = pad_images_for_bands(jnp.asarray(ds.images[:2], jnp.float32) / 255.0, h_pad)
    batch = ViewBatch(images=imgs, viewmats=jnp.asarray(ds.viewmats[:2]),
                      Ks=jnp.asarray(ds.Ks[:2]))
    tsN, _ = sstep(ts, batch)
    C = tsN.gauss.params.means.shape[0]
    for arr in (tsN.gauss.params.means, tsN.gauss.params.quats,
                tsN.opt.mu.means, tsN.opt.nu.log_scales,
                tsN.gauss.xyz_grad_accum, tsN.gauss.max_radii2d):
        shard_rows = {s.data.shape[0] for s in arr.addressable_shards}
        assert shard_rows == {C // 4}, (arr.shape, shard_rows)


def test_graft_entry_dryrun():
    """The driver contract: dryrun_multichip builds an n-device mesh and runs
    one full sharded train step."""
    import importlib.util
    spec = importlib.util.spec_from_file_location(
        "graft_entry", "/root/repo/__graft_entry__.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    mod.dryrun_multichip(8)


def test_sharded_pose_refine_matches_single_chip(rng):
    """Pose refinement under a mesh: the replicated (V, 6) se(3) state gets
    the same gradient (shard_map transposes replicated inputs with a psum)
    and the same Adam update as the single-chip step."""
    from gaussian_splatting_tpu.training.step import pose_state_init

    ds, ts = _setup(rng)
    V = ds.viewmats.shape[0]
    ts = ts._replace(poses=pose_state_init(V),
                     iteration=jnp.full((), 5, jnp.int32))
    cfg = TrainingConfig(batch_size=2, backend="ref", optimize_poses=True,
                         pose_start_iter=0, pose_lr_init=1e-3,
                         pose_lr_final=1e-4)
    mesh = make_mesh(data=2, model=2)
    sstep, band_h, h_pad = make_sharded_train_step(
        cfg, mesh, ds.width, ds.height, 0, "ref", 2.0, donate=False)
    step1 = make_train_step(cfg, ds.width, ds.height, 0, "ref", 2.0,
                            donate=False)

    imgs = jnp.asarray(ds.images[:2], jnp.float32) / 255.0
    vidx = jnp.asarray([0, 1], jnp.int32)
    batch1 = ViewBatch(images=imgs, viewmats=jnp.asarray(ds.viewmats[:2]),
                       Ks=jnp.asarray(ds.Ks[:2]), view_idx=vidx)
    batchN = ViewBatch(images=pad_images_for_bands(imgs, h_pad),
                       viewmats=jnp.asarray(ds.viewmats[:2]),
                       Ks=jnp.asarray(ds.Ks[:2]), view_idx=vidx)

    ts1, m1 = step1(ts, batch1)
    tsN, mN = sstep(ts, batchN)
    d1 = np.asarray(ts1.poses.deltas)
    dN = np.asarray(tsN.poses.deltas)
    assert np.abs(d1[:2]).max() > 0, "pose update must actually move"
    np.testing.assert_allclose(dN, d1, rtol=1e-4, atol=1e-7)
    # Views not in the batch stay exactly zero.
    assert np.all(d1[2:] == 0) and np.all(dN[2:] == 0)
    np.testing.assert_allclose(float(mN["grad_norm/poses"]),
                               float(m1["grad_norm/poses"]),
                               rtol=1e-4, atol=1e-7)


def test_backward_hlo_uses_reduce_scatter(rng):
    """The gathered screen tensors' backward must come back as
    reduce-scatter (per-gaussian gradients arrive already sharded), not as
    a full all-reduce + slice — the ICI traffic claim in ARCHITECTURE.md.
    collective-permute = the SSIM halo exchange."""
    import re

    ds, ts = _setup(rng)
    cfg = TrainingConfig(batch_size=2, backend="ref")
    mesh = make_mesh(data=2, model=4)
    step, band_h, h_pad = make_sharded_train_step(
        cfg, mesh, ds.width, ds.height, 0, "ref", 2.0, donate=False)
    imgs = pad_images_for_bands(
        jnp.asarray(ds.images[:2], jnp.float32) / 255.0, h_pad)
    batch = ViewBatch(images=imgs, viewmats=jnp.asarray(ds.viewmats[:2]),
                      Ks=jnp.asarray(ds.Ks[:2]))
    txt = step.lower(ts, batch).compile().as_text()
    counts = {op: len(re.findall(op, txt))
              for op in ("reduce-scatter", "all-gather",
                         "collective-permute")}
    assert counts["reduce-scatter"] >= 1, counts
    assert counts["all-gather"] >= 1, counts
    assert counts["collective-permute"] >= 1, counts
