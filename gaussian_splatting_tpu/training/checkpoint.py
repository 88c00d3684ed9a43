"""Checkpointing **with resume** — the reference saves ``.pth`` checkpoints
every 10k iterations (``trainer.py:384-395``) but has no code path that ever
loads one for training; here save/restore round-trips the full train state
(params, alive mask, Adam moments, accumulators, iteration), fixing that gap.

Format: a single ``.npz`` (portable, no torch dependency) plus a paired
``.ply`` snapshot like the reference. A tolerant loader also ingests
reference-style torch ``.pth`` state dicts (alias keys as in reference
``export.py:89-117``) for cross-framework eval.
"""

from __future__ import annotations

import dataclasses
import json
import os
from typing import Optional, Tuple

import jax.numpy as jnp
import numpy as np

from gaussian_splatting_tpu.models.gaussians import GaussianParams, GaussianState, empty_state
from gaussian_splatting_tpu.training.optimizer import AdamState
from gaussian_splatting_tpu.training.step import TrainState

_PARAM_KEYS = ("means", "quats", "log_scales", "logit_opacities", "features_dc", "features_rest")


def save_checkpoint(path: str, state: TrainState, extra: Optional[dict] = None) -> None:
    arrays = {}
    for k in _PARAM_KEYS:
        arrays[f"params/{k}"] = np.asarray(getattr(state.gauss.params, k))
        arrays[f"adam_mu/{k}"] = np.asarray(getattr(state.opt.mu, k))
        arrays[f"adam_nu/{k}"] = np.asarray(getattr(state.opt.nu, k))
    arrays["alive"] = np.asarray(state.gauss.alive)
    arrays["xyz_grad_accum"] = np.asarray(state.gauss.xyz_grad_accum)
    arrays["xyz_grad_count"] = np.asarray(state.gauss.xyz_grad_count)
    arrays["max_radii2d"] = np.asarray(state.gauss.max_radii2d)
    arrays["adam_step"] = np.asarray(state.opt.step)
    arrays["iteration"] = np.asarray(state.iteration)
    if state.poses is not None:
        arrays["poses/deltas"] = np.asarray(state.poses.deltas)
        arrays["poses/mu"] = np.asarray(state.poses.mu)
        arrays["poses/nu"] = np.asarray(state.poses.nu)
    arrays["meta_json"] = np.frombuffer(
        json.dumps(extra or {}).encode(), dtype=np.uint8
    )
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        np.savez(f, **arrays)
    os.replace(tmp, path)


def load_checkpoint(path: str) -> Tuple[TrainState, dict]:
    z = np.load(path)
    params = GaussianParams(**{k: jnp.asarray(z[f"params/{k}"]) for k in _PARAM_KEYS})
    mu = GaussianParams(**{k: jnp.asarray(z[f"adam_mu/{k}"]) for k in _PARAM_KEYS})
    nu = GaussianParams(**{k: jnp.asarray(z[f"adam_nu/{k}"]) for k in _PARAM_KEYS})
    gauss = GaussianState(
        params=params,
        alive=jnp.asarray(z["alive"]),
        xyz_grad_accum=jnp.asarray(z["xyz_grad_accum"]),
        xyz_grad_count=jnp.asarray(z["xyz_grad_count"]),
        max_radii2d=jnp.asarray(z["max_radii2d"]),
    )
    poses = None
    if "poses/deltas" in z:
        from gaussian_splatting_tpu.training.step import PoseState

        poses = PoseState(deltas=jnp.asarray(z["poses/deltas"]),
                          mu=jnp.asarray(z["poses/mu"]),
                          nu=jnp.asarray(z["poses/nu"]))
    state = TrainState(
        gauss=gauss,
        opt=AdamState(mu=mu, nu=nu, step=jnp.asarray(z["adam_step"])),
        iteration=jnp.asarray(z["iteration"]),
        poses=poses,
    )
    meta = json.loads(bytes(z["meta_json"].tobytes()).decode() or "{}")
    return state, meta


def load_reference_pth(path: str) -> GaussianState:
    """Load a reference-format torch checkpoint (``trainer.py:384-395``
    layout: {iteration, model_state, optimizer_state, n_gaussians} or a bare
    state_dict) into a GaussianState. Tolerant to the same key aliases as the
    reference exporter (``export.py:89-117``)."""
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    sd = ckpt
    if isinstance(ckpt, dict):
        for k in ("model_state", "state_dict"):
            if k in ckpt and isinstance(ckpt[k], dict):
                sd = ckpt[k]
                break

    def get(*names):
        for nm in names:
            if nm in sd:
                v = sd[nm]
                return v.detach().cpu().numpy() if torch.is_tensor(v) else np.asarray(v)
        return None

    xyz = get("xyz", "means3D", "positions", "points")
    n = xyz.shape[0]
    fdc = get("features_dc", "f_dc", "dc").reshape(n, 1, 3)
    frest = get("features_rest", "f_rest", "sh_rest")
    frest = (frest.reshape(n, -1, 3) if frest is not None
             else np.zeros((n, 15, 3), np.float32))
    op = get("opacity", "opacities", "logit_opacity").reshape(n, 1)
    sc = get("scaling", "scales", "log_scales").reshape(n, -1)
    if sc.shape[1] == 1:
        sc = np.repeat(sc, 3, axis=1)
    rot = get("rotation", "rotations", "quat").reshape(n, 4)

    state = empty_state(max(n, 1))
    p = state.params
    params = dataclasses.replace(
        p,
        means=jnp.asarray(xyz, jnp.float32),
        features_dc=jnp.asarray(fdc, jnp.float32),
        features_rest=jnp.asarray(frest[:, :15], jnp.float32),
        logit_opacities=jnp.asarray(op, jnp.float32),
        log_scales=jnp.asarray(sc, jnp.float32),
        quats=jnp.asarray(rot, jnp.float32),
    )
    return dataclasses.replace(
        state, params=params, alive=jnp.ones((n,), bool)
    )
