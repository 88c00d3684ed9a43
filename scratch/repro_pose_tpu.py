"""Minimal repro: pose-refine train step on TPU with the pallas backend."""
import dataclasses
import numpy as np
import jax, jax.numpy as jnp
from gaussian_splatting_tpu.core.cameras import look_at, make_intrinsics
from gaussian_splatting_tpu.core.sh import rgb_to_sh0
from gaussian_splatting_tpu.models.gaussians import GaussianParams, empty_state
from gaussian_splatting_tpu.training.config import TrainingConfig
from gaussian_splatting_tpu.training.optimizer import adam_init
from gaussian_splatting_tpu.training.step import (
    TrainState, ViewBatch, make_train_step, pose_state_init)

rng = np.random.default_rng(0)
n, W, H, V = 500, 128, 128, 2
params = GaussianParams(
    means=jnp.asarray(rng.normal(size=(n,3)), jnp.float32)*0.6,
    quats=jnp.tile(jnp.asarray([1.,0,0,0]), (n,1)),
    log_scales=jnp.log(jnp.asarray(rng.uniform(0.05,0.2,(n,3)), jnp.float32)),
    logit_opacities=jnp.full((n,1), 2.0),
    features_dc=jnp.asarray(rgb_to_sh0(rng.uniform(0.1,0.9,(n,1,3)).astype(np.float32))),
    features_rest=jnp.zeros((n,15,3), jnp.float32),
)
K = make_intrinsics(W, H, focal_px=140.0)
vms = jnp.stack([look_at(eye=(2.5*np.sin(a),0.4,-2.5*np.cos(a)), target=(0,0,0))
                 for a in (0.0, 1.0)])
imgs = jnp.zeros((V,H,W,3), jnp.float32)
gauss = dataclasses.replace(empty_state(n), params=params, alive=jnp.ones((n,), bool))
cfg = TrainingConfig(batch_size=V, backend="pallas",
                     optimize_poses=True, pose_lr_init=3e-3, pose_start_iter=0)
state = TrainState(gauss=gauss, opt=adam_init(gauss.params),
                   iteration=jnp.zeros((), jnp.int32), poses=pose_state_init(V))
step = make_train_step(cfg, W, H, 0, "pallas", 8192, 2.0, donate=False)
batch = ViewBatch(images=imgs, viewmats=vms,
                  Ks=jnp.tile(K[None], (V,1,1)),
                  view_idx=jnp.arange(V, dtype=jnp.int32))
state, m = step(state, batch)
print("loss", float(m["loss"]), "pose delta max", float(m["pose/delta_max"]))
print("OK")
