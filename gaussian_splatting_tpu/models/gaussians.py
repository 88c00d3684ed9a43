"""Gaussian parameter container — the TPU-native redesign of the reference's
``GaussianModel`` (reference ``gaussian_model.py:53-108``).

The reference grows/shrinks parameter tensors at every densify event — the
one pattern XLA cannot compile (dynamic shapes force retraces). Here the
population lives in **fixed-capacity** buffers with an ``alive`` mask:

- parameter arrays have a static leading dim ``capacity`` >= population;
- dead slots have opacity forced to 0 at render time (zero contribution,
  zero gradient);
- densify/clone/split/prune are masked scatters into free slots
  (``models/densify.py``);
- when the population approaches capacity the host grows the buffers
  (one recompile per capacity step, amortized by 1.5x growth).

Raw parameterization matches the reference exactly (``gaussian_model.py:
65-88``): log-space scales (exp), logit-space opacity (sigmoid), w-first
quaternions (L2-normalized), SH split into dc (N,1,3) + rest (N,15,3).
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from gaussian_splatting_tpu.core.activations import opacity_inverse_activation
from gaussian_splatting_tpu.core.sh import rgb_to_sh0

NEG_INF_LOGIT = -20.0  # sigmoid(-20) ~ 2e-9: dead-slot opacity


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class GaussianParams:
    """Trainable parameters; every leaf has leading dim = capacity."""

    means: jnp.ndarray          # (C, 3)
    quats: jnp.ndarray          # (C, 4) w-first, unnormalized
    log_scales: jnp.ndarray     # (C, 3)
    logit_opacities: jnp.ndarray  # (C, 1)
    features_dc: jnp.ndarray    # (C, 1, 3)
    features_rest: jnp.ndarray  # (C, 15, 3)

    @property
    def capacity(self) -> int:
        return self.means.shape[0]

    @property
    def sh_coeffs(self) -> jnp.ndarray:
        return jnp.concatenate([self.features_dc, self.features_rest], axis=1)

    def masked_opacities(self, alive: jnp.ndarray) -> jnp.ndarray:
        """Logit opacities with dead slots clamped to ~0 opacity."""
        return jnp.where(alive[:, None], self.logit_opacities, NEG_INF_LOGIT)


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class GaussianState:
    """Parameters plus the densification bookkeeping buffers
    (reference ``gaussian_model.py:78-80``)."""

    params: GaussianParams
    alive: jnp.ndarray            # (C,) bool
    xyz_grad_accum: jnp.ndarray   # (C, 3) summed ||grad|| components
    xyz_grad_count: jnp.ndarray   # (C, 1)
    max_radii2d: jnp.ndarray      # (C,) int32

    @property
    def capacity(self) -> int:
        return self.params.capacity

    def n_alive(self) -> jnp.ndarray:
        return jnp.sum(self.alive.astype(jnp.int32))


def _round_capacity(n: int, multiple: int = 2048) -> int:
    return max(((n + multiple - 1) // multiple) * multiple, multiple)


def empty_state(capacity: int, dtype=jnp.float32) -> GaussianState:
    C = capacity
    params = GaussianParams(
        means=jnp.zeros((C, 3), dtype),
        quats=jnp.concatenate(
            [jnp.ones((C, 1), dtype), jnp.zeros((C, 3), dtype)], axis=1
        ),
        log_scales=jnp.full((C, 3), -3.0, dtype),
        logit_opacities=jnp.zeros((C, 1), dtype),
        features_dc=jnp.zeros((C, 1, 3), dtype),
        features_rest=jnp.zeros((C, 15, 3), dtype),
    )
    return GaussianState(
        params=params,
        alive=jnp.zeros((C,), bool),
        xyz_grad_accum=jnp.zeros((C, 3), dtype),
        xyz_grad_count=jnp.zeros((C, 1), dtype),
        max_radii2d=jnp.zeros((C,), jnp.int32),
    )


def init_random(n: int, capacity: Optional[int] = None, seed: int = 0) -> GaussianState:
    """Random init fallback (reference ``trainer.py:117-121``)."""
    C = capacity or _round_capacity(int(n * 1.5))
    state = empty_state(C)
    key = jax.random.PRNGKey(seed)
    means = jax.random.normal(key, (n, 3)) * 1.0
    state = dataclasses.replace(
        state,
        params=dataclasses.replace(
            state.params,
            means=state.params.means.at[:n].set(means),
            logit_opacities=state.params.logit_opacities.at[:n].set(
                opacity_inverse_activation(jnp.full((n, 1), 0.005))
            ),
        ),
        alive=state.alive.at[:n].set(True),
    )
    return state


def knn_mean_distance(points: np.ndarray, queries: np.ndarray, k: int = 7) -> np.ndarray:
    """Mean distance to the k-1 nearest neighbors (excluding self) — native
    C++ grid-hash kNN (native/pointops.cpp) with scipy KD-tree fallback;
    init-time only, mirroring reference ``trainer.py:172-186``."""
    from gaussian_splatting_tpu.utils.native import knn_mean_distance as _knn

    return _knn(points, queries, k=min(k, len(points)))


def init_from_points(
    points: np.ndarray,
    colors: Optional[np.ndarray],
    n_gaussians: int,
    capacity: Optional[int] = None,
    seed: int = 0,
    init_opacity: float = 0.005,
    jitter: float = 1e-3,
) -> GaussianState:
    """Initialize from an SfM point cloud — reference ``trainer.py:111-187``:
    sample points (with replacement when oversampling), add tiny positional
    jitter, RGB -> SH0 DC coefficients, kNN-7 mean-distance isotropic scales,
    opacity 0.005, identity rotations.

    Host-side (numpy) by design: runs once, feeds device buffers.
    """
    rng = np.random.default_rng(seed)
    n_pts = len(points)
    assert n_pts > 0
    if n_gaussians <= n_pts:
        idx = rng.permutation(n_pts)[:n_gaussians]
    else:
        idx = rng.integers(0, n_pts, size=n_gaussians)
    pos = points[idx] + rng.normal(size=(n_gaussians, 3)) * jitter

    scales = knn_mean_distance(points.astype(np.float64), pos, k=7)
    scales = np.clip(scales, 1e-9, None)
    log_scales = np.log(scales)[:, None].repeat(3, axis=1)

    C = capacity or _round_capacity(int(n_gaussians * 1.5))
    state = empty_state(C)
    p = state.params
    new = dataclasses.replace(
        p,
        means=p.means.at[:n_gaussians].set(jnp.asarray(pos, jnp.float32)),
        log_scales=p.log_scales.at[:n_gaussians].set(jnp.asarray(log_scales, jnp.float32)),
        logit_opacities=p.logit_opacities.at[:n_gaussians].set(
            opacity_inverse_activation(jnp.full((n_gaussians, 1), init_opacity))
        ),
    )
    if colors is not None and len(colors) > 0:
        sh0 = rgb_to_sh0(jnp.asarray(colors[idx], jnp.float32))
        new = dataclasses.replace(
            new, features_dc=new.features_dc.at[:n_gaussians, 0, :].set(sh0)
        )
    return dataclasses.replace(
        state, params=new, alive=state.alive.at[:n_gaussians].set(True)
    )


def grow_capacity(state: GaussianState, new_capacity: int) -> GaussianState:
    """Host-side capacity growth: zero-pad every buffer. Causes one recompile
    of the jitted step at the new static shape."""
    C_old = state.capacity
    assert new_capacity > C_old
    pad = new_capacity - C_old

    def pad_leaf(x):
        widths = [(0, pad)] + [(0, 0)] * (x.ndim - 1)
        return jnp.pad(x, widths)

    params = jax.tree_util.tree_map(pad_leaf, state.params)
    # Keep dead-slot quats at identity so normalization stays well-defined.
    params = dataclasses.replace(
        params, quats=params.quats.at[C_old:, 0].set(1.0)
    )
    return GaussianState(
        params=params,
        alive=pad_leaf(state.alive),
        xyz_grad_accum=pad_leaf(state.xyz_grad_accum),
        xyz_grad_count=pad_leaf(state.xyz_grad_count),
        max_radii2d=pad_leaf(state.max_radii2d),
    )
