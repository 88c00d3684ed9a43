"""Adaptive densification under static shapes.

Reimplements the reference's clone/split/prune sweep with Adam-moment
splicing (reference ``gaussian_model.py:110-366``) as fully jittable masked
scatters over fixed-capacity buffers:

- clone: high-gradient, small (max_scale <= extent*clone_ratio), visible
  gaussians copied into free slots;
- split: high-gradient, large gaussians replaced by two children at
  scale/1.6 with positional jitter ~ N(0, child_scale) (child 1 reuses the
  parent's slot, child 2 takes a free slot);
- population cap: when clone+split would exceed ``max_gaussians`` (or the
  buffer capacity), only the highest-gradient candidates are kept
  (reference ``_top_k_mask_by_grad``, ``gaussian_model.py:233-249``) — here
  as a rank threshold from one argsort;
- prune: opacity < min_opacity or max_scale > extent*prune_ratio -> dead;
- Adam splice: moments of every *new* gaussian (clone dst, both split
  children) are zeroed, moments of surviving gaussians untouched — exactly
  the reference's ``_replace_param_in_optimizer`` semantics
  (``gaussian_model.py:9-50``).

All branches are data-independent masks; one jitted call, no recompiles.
"""

import dataclasses
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from gaussian_splatting_tpu.core.activations import (
    opacity_activation,
    opacity_inverse_activation,
    scale_activation,
)
from gaussian_splatting_tpu.models.gaussians import GaussianParams, GaussianState


class DensifyStats(NamedTuple):
    n_cloned: jnp.ndarray
    n_split: jnp.ndarray
    n_pruned: jnp.ndarray
    n_before: jnp.ndarray
    n_after: jnp.ndarray
    capped: jnp.ndarray


def _scatter_rows(tree, src_idx, dst_idx, valid):
    """tree[dst] = tree[src] for valid entries (drop otherwise)."""
    C = jax.tree_util.tree_leaves(tree)[0].shape[0]
    src_c = jnp.minimum(src_idx, C - 1)
    dst_w = jnp.where(valid, dst_idx, C)  # out-of-bounds -> dropped

    def one(a):
        return a.at[dst_w].set(a[src_c], mode="drop")

    return jax.tree_util.tree_map(one, tree)


def _zero_rows(tree, idx, valid):
    dst_w = jnp.where(valid, idx, jax.tree_util.tree_leaves(tree)[0].shape[0])

    def one(a):
        return a.at[dst_w].set(jnp.zeros_like(a[jnp.minimum(idx, a.shape[0] - 1)]), mode="drop")

    return jax.tree_util.tree_map(one, tree)


def densify_and_prune(
    state: GaussianState,
    adam_moments,  # pytree pair (mu, nu) each matching GaussianParams
    key: jax.Array,
    grads_threshold: float,
    min_opacity: float,
    extent: jnp.ndarray,
    max_gaussians: int,
    clone_extent_ratio: float = 0.1,
    prune_extent_ratio: float = 2.0,
    topk_fraction: float = 0.0,
) -> Tuple[GaussianState, tuple, DensifyStats]:
    """One clone/split/prune sweep. Fully jittable; shapes never change.

    ``topk_fraction > 0`` replaces the absolute gradient threshold with a
    rank threshold: the top ``topk_fraction`` of alive gaussians by
    accumulated grad norm are densified each event. The reference's fixed
    5e-4 threshold (``training_config.py:28``) is calibrated to one
    scene/resolution gradient scale; on scenes where mean ||grad_xyz|| is
    ~2e-5 it selects nobody and densification silently dies (measured:
    20k->6k gaussians over 3.5k iters, 0 splits). The rank form is
    scale-free and costs one (C,)-sort per event."""
    p = state.params
    C = state.capacity
    alive = state.alive

    grads = state.xyz_grad_accum / (state.xyz_grad_count + 1e-8)
    grad_norm = jnp.linalg.norm(grads, axis=-1)
    scales = scale_activation(p.log_scales)
    max_scale = jnp.max(scales, axis=-1)
    op = opacity_activation(p.logit_opacities)[:, 0]

    if topk_fraction > 0.0:
        n_alive0 = jnp.sum(alive.astype(jnp.int32))
        k = jnp.maximum((topk_fraction * n_alive0).astype(jnp.int32), 1)
        desc = jnp.sort(jnp.where(alive, grad_norm, -jnp.inf))[::-1]
        rank_thresh = desc[jnp.minimum(k, C - 1)]
        # Strict > : selects exactly the top k (ties beyond k drop out).
        # Never densify zero-gradient (invisible) gaussians.
        sel = grad_norm > jnp.maximum(rank_thresh, 1e-12)
    else:
        sel = grad_norm >= grads_threshold
    hot = alive & sel & (op > min_opacity)
    clone_mask = hot & (max_scale <= extent * clone_extent_ratio)
    split_mask = hot & (max_scale > extent * clone_extent_ratio)

    n_alive = jnp.sum(alive.astype(jnp.int32))
    n_before = n_alive
    cap = jnp.minimum(jnp.int32(max_gaussians), jnp.int32(C))
    budget = jnp.maximum(cap - n_alive, 0)

    combined = clone_mask | split_mask
    n_cand = jnp.sum(combined.astype(jnp.int32))
    capped = n_cand > budget
    # Rank candidates by gradient (descending); keep the top `budget`.
    keys = jnp.where(combined, grad_norm, -jnp.inf)
    order = jnp.argsort(-keys)
    rank = jnp.zeros((C,), jnp.int32).at[order].set(jnp.arange(C, dtype=jnp.int32))
    keep = combined & (rank < budget)
    clone_mask = clone_mask & keep
    split_mask = split_mask & keep
    n_clone = jnp.sum(clone_mask.astype(jnp.int32))
    n_split = jnp.sum(split_mask.astype(jnp.int32))

    free_idx = jnp.nonzero(~alive, size=C, fill_value=C)[0].astype(jnp.int32)
    clone_src = jnp.nonzero(clone_mask, size=C, fill_value=C)[0].astype(jnp.int32)
    split_src = jnp.nonzero(split_mask, size=C, fill_value=C)[0].astype(jnp.int32)
    slot = jnp.arange(C, dtype=jnp.int32)

    # --- clones -> free slots [0, n_clone) ---------------------------------
    clone_valid = slot < n_clone
    clone_dst = free_idx  # position i uses the i-th free slot
    params = _scatter_rows(p, clone_src, clone_dst, clone_valid)
    alive = alive.at[jnp.where(clone_valid, clone_dst, C)].set(True, mode="drop")
    mu, nu = adam_moments
    mu = _zero_rows(mu, clone_dst, clone_valid)
    nu = _zero_rows(nu, clone_dst, clone_valid)

    # --- splits ------------------------------------------------------------
    # child 1 reuses the parent slot; child 2 takes free slot n_clone + i.
    split_valid = slot < n_split
    child2_dst = free_idx[jnp.minimum(slot + n_clone, C - 1)]
    params = _scatter_rows(params, split_src, child2_dst, split_valid)
    alive = alive.at[jnp.where(split_valid, child2_dst, C)].set(True, mode="drop")

    # Shrink scales and jitter positions of both children
    # (reference ``_split_gaussians``: scale/1.6, noise ~ N(0, child_scale)).
    log16 = jnp.log(1.6).astype(p.log_scales.dtype)
    k1, k2 = jax.random.split(key)
    src_c = jnp.minimum(split_src, C - 1)
    child_log_scales = p.log_scales[src_c] - log16
    child_scales = scale_activation(child_log_scales)
    eps1 = jax.random.normal(k1, (C, 3), p.means.dtype) * child_scales
    eps2 = jax.random.normal(k2, (C, 3), p.means.dtype) * child_scales
    parent_means = p.means[src_c]

    def place(dst, valid, means_new, lsc_new):
        dst_w = jnp.where(valid, dst, C)
        return dst_w, means_new, lsc_new

    d1, m1, s1 = place(split_src, split_valid, parent_means + eps1, child_log_scales)
    d2, m2, s2 = place(child2_dst, split_valid, parent_means + eps2, child_log_scales)
    params = dataclasses.replace(
        params,
        means=params.means.at[d1].set(m1, mode="drop").at[d2].set(m2, mode="drop"),
        log_scales=params.log_scales.at[d1].set(s1, mode="drop").at[d2].set(s2, mode="drop"),
    )
    # Both children are new gaussians: zero their moments.
    for dst, valid in ((split_src, split_valid), (child2_dst, split_valid)):
        mu = _zero_rows(mu, dst, valid)
        nu = _zero_rows(nu, dst, valid)

    # --- prune -------------------------------------------------------------
    scales2 = scale_activation(params.log_scales)
    max_scale2 = jnp.max(scales2, axis=-1)
    op2 = opacity_activation(params.logit_opacities)[:, 0]
    prune_mask = alive & ((op2 < min_opacity) | (max_scale2 > extent * prune_extent_ratio))
    n_pruned = jnp.sum(prune_mask.astype(jnp.int32))
    alive = alive & ~prune_mask

    new_state = GaussianState(
        params=params,
        alive=alive,
        xyz_grad_accum=jnp.zeros_like(state.xyz_grad_accum),
        xyz_grad_count=jnp.zeros_like(state.xyz_grad_count),
        max_radii2d=jnp.zeros_like(state.max_radii2d),
    )
    stats = DensifyStats(
        n_cloned=n_clone,
        n_split=n_split,
        n_pruned=n_pruned,
        n_before=n_before,
        n_after=jnp.sum(alive.astype(jnp.int32)),
        capped=capped,
    )
    return new_state, (mu, nu), stats


def reset_opacity(params: GaussianParams, ceiling: float = 0.01) -> GaussianParams:
    """Periodic opacity reset: every gaussian's opacity -> min(current, 0.01)
    so it must re-earn its place (reference ``trainer.py:841-850``). Adam
    moments are untouched, exactly like the reference."""
    current = opacity_activation(params.logit_opacities)
    target = jnp.clip(jnp.minimum(current, ceiling), 1e-6, 1.0 - 1e-6)
    return dataclasses.replace(
        params, logit_opacities=opacity_inverse_activation(target)
    )


def clamp_scales(params: GaussianParams, extent, clamp_ratio: float) -> GaussianParams:
    """Per-step scale ceiling (reference ``trainer.py:856-859``)."""
    ceiling = jnp.log(extent * clamp_ratio + 1e-9)
    return dataclasses.replace(
        params, log_scales=jnp.minimum(params.log_scales, ceiling)
    )
