"""Trainer-level multi-chip path: full training loop on a 2x2 virtual mesh."""

import pytest
import jax
import jax.numpy as jnp
import numpy as np

from gaussian_splatting_tpu.training.config import TrainingConfig
from gaussian_splatting_tpu.training.trainer import GaussianTrainer

from test_training import _synthetic_scene


@pytest.mark.slow
def test_trainer_on_mesh(rng, tmp_path):
    assert len(jax.devices()) == 8
    ds, gt_means = _synthetic_scene(rng, n_views=6)
    cfg = TrainingConfig(
        iterations=20, batch_size=2, backend="ref",
        initial_gaussians=48, max_gaussians=1024,
        densify_from_iteration=1000, val_interval=1000,
        checkpoint_interval=1000, log_scalar_interval=5,
        sh_increment_interval=100, sh_degree_max=0,
        mesh_data=2, mesh_tile=2,
    )
    trainer = GaussianTrainer(cfg)
    state = trainer.train(ds, str(tmp_path / "mesh_run"), points=gt_means)
    assert int(state.iteration) == 20
    assert (tmp_path / "mesh_run" / "final.ply").exists()
    # Metrics were logged with finite loss values.
    import json

    losses = []
    with open(tmp_path / "mesh_run" / "metrics.jsonl") as f:
        for line in f:
            r = json.loads(line)
            if "loss" in r:
                losses.append(r["loss"])
    assert losses and np.isfinite(losses).all()
