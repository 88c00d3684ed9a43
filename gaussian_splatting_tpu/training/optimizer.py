"""Manual Adam with per-parameter-group learning rates and splice-friendly
state.

Deliberately not optax: densification must scatter-zero moment rows of
reused slots (the reference's ``_replace_param_in_optimizer`` Adam splicing,
``gaussian_model.py:9-50``), so the moments are a plain pytree matching
``GaussianParams`` that ``models/densify.py`` edits directly.

Matches torch.optim.Adam semantics (reference ``trainer.py:331-340``):
update = -lr * (mu / (1-b1^t)) / (sqrt(nu / (1-b2^t)) + eps), eps = 1e-15,
with one shared step counter (torch keeps one per group; groups step in
lockstep so a single counter is equivalent — including the reference
behavior where freshly spliced rows inherit the global bias correction).
"""

from typing import NamedTuple

import jax
import jax.numpy as jnp

from gaussian_splatting_tpu.models.gaussians import GaussianParams


class AdamState(NamedTuple):
    mu: GaussianParams
    nu: GaussianParams
    step: jnp.ndarray  # () int32


def adam_init(params: GaussianParams) -> AdamState:
    zeros = jax.tree_util.tree_map(jnp.zeros_like, params)
    return AdamState(mu=zeros, nu=jax.tree_util.tree_map(jnp.zeros_like, params),
                     step=jnp.zeros((), jnp.int32))


def group_lrs(config, xyz_lr) -> GaussianParams:
    """Per-group learning rates as a GaussianParams-shaped pytree of scalars
    (reference per-group LRs, ``trainer.py:331-340``). ``xyz_lr`` is traced —
    it follows the exponential decay schedule."""
    return GaussianParams(
        means=xyz_lr,
        quats=jnp.float32(config.lr_rotation),
        log_scales=jnp.float32(config.lr_scaling),
        logit_opacities=jnp.float32(config.lr_opacity),
        features_dc=jnp.float32(config.lr_features_dc),
        features_rest=jnp.float32(config.lr_features_rest),
    )


def adam_update(
    grads: GaussianParams,
    state: AdamState,
    params: GaussianParams,
    lrs: GaussianParams,
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-15,
):
    step = state.step + 1
    t = step.astype(jnp.float32)
    c1 = 1.0 - b1**t
    c2 = 1.0 - b2**t

    tmap = jax.tree_util.tree_map
    new_mu = tmap(lambda g, m: b1 * m + (1.0 - b1) * g, grads, state.mu)
    new_nu = tmap(lambda g, v: b2 * v + (1.0 - b2) * g * g, grads, state.nu)
    new_params = tmap(
        lambda p, m, v, lr: p - lr * (m / c1) / (jnp.sqrt(v / c2) + eps),
        params, new_mu, new_nu, lrs,
    )
    return new_params, AdamState(mu=new_mu, nu=new_nu, step=step)


def xyz_lr_schedule(config, iteration) -> jnp.ndarray:
    """Exponential decay from position_lr_init to position_lr_final over
    position_lr_max_steps (reference ``trainer.py:373-382``)."""
    progress = jnp.minimum(
        iteration.astype(jnp.float32) / float(config.position_lr_max_steps), 1.0
    )
    return jnp.float32(config.position_lr_init) * (
        config.position_lr_final / config.position_lr_init
    ) ** progress
