"""Pallas kernels inside shard_map: the multi-chip rasterization path with
the real kernel code (interpret mode on the virtual CPU mesh)."""

import pytest
import jax
import jax.numpy as jnp
import numpy as np

from gaussian_splatting_tpu.models.gaussians import init_from_points
from gaussian_splatting_tpu.parallel.mesh import make_mesh
from gaussian_splatting_tpu.parallel.sharded_step import (
    make_sharded_train_step,
    pad_images_for_bands,
)
from gaussian_splatting_tpu.training.config import TrainingConfig
from gaussian_splatting_tpu.training.optimizer import adam_init
from gaussian_splatting_tpu.training.step import TrainState, ViewBatch


def _pallas_setup(rng):
    pts = rng.normal(size=(96, 3)).astype(np.float32) * 0.5
    gauss = init_from_points(pts, None, 96, capacity=128)
    ts = TrainState(gauss=gauss, opt=adam_init(gauss.params),
                    iteration=jnp.zeros((), jnp.int32))
    imgs = jnp.asarray(rng.uniform(size=(2, 32, 32, 3)), jnp.float32)
    vm = jnp.tile(jnp.eye(4, dtype=jnp.float32).at[2, 3].set(4.0)[None], (2, 1, 1))
    K = jnp.tile(jnp.asarray([[40.0, 0, 16], [0, 40.0, 16], [0, 0, 1]],
                             jnp.float32)[None], (2, 1, 1))
    return ts, imgs, vm, K


@pytest.mark.slow
def test_sharded_step_with_pallas_kernels(rng):
    ts, imgs, vm, K = _pallas_setup(rng)
    cfg = TrainingConfig(batch_size=2, backend="pallas")
    mesh = make_mesh(data=2, model=2)
    step, band_h, h_pad = make_sharded_train_step(
        cfg, mesh, 32, 32, 0, "pallas", 2.0, donate=False)
    batch = ViewBatch(images=pad_images_for_bands(imgs, h_pad), viewmats=vm, Ks=K)
    losses = []
    for _ in range(3):
        ts, m = step(ts, batch)
        losses.append(float(m["loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] <= losses[0]


@pytest.mark.slow
def test_sharded_pallas_matches_single_chip(rng):
    """VERDICT round-3 #7: the sharded pallas step (model=2 tile bands,
    viewport-shifted binning, gathered screen tensors, sorted-reduce
    gradients per band) must produce the SAME loss and parameter update as
    the single-chip pallas step — not merely a finite descending loss.
    Tolerances cover f32 reduction-order noise only (psum and the per-band
    gradient reduce change summation order)."""
    from gaussian_splatting_tpu.training.step import make_train_step

    ts, imgs, vm, K = _pallas_setup(rng)
    cfg = TrainingConfig(batch_size=2, backend="pallas")
    mesh = make_mesh(data=2, model=2)
    sstep, band_h, h_pad = make_sharded_train_step(
        cfg, mesh, 32, 32, 0, "pallas", 2.0, donate=False)
    step1 = make_train_step(cfg, 32, 32, 0, "pallas", 2.0, donate=False)

    batch1 = ViewBatch(images=imgs, viewmats=vm, Ks=K)
    batchN = ViewBatch(images=pad_images_for_bands(imgs, h_pad),
                       viewmats=vm, Ks=K)
    ts1, m1 = step1(ts, batch1)
    tsN, mN = sstep(ts, batchN)

    np.testing.assert_allclose(float(mN["l1"]), float(m1["l1"]),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(float(mN["loss"]), float(m1["loss"]),
                               rtol=1e-5, atol=1e-6)
    # Overflow accounting must agree too: bands partition the tile grid.
    assert int(mN["stats/n_isect"]) == int(m1["stats/n_isect"])
    for k in ("means", "log_scales", "features_dc", "logit_opacities"):
        a = np.asarray(getattr(ts1.gauss.params, k))
        b = np.asarray(getattr(tsN.gauss.params, k))
        err = np.abs(a - b).max()
        assert err < 1e-5, (k, err)
