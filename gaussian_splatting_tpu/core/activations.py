"""Parameter activations, matching the reference model exactly
(``gaussian_model.py:86-88``): scales stored in log-space (exp activation),
opacity in logit-space (sigmoid activation), rotations L2-normalized.
"""

import jax
import jax.numpy as jnp


def scale_activation(log_scales: jnp.ndarray) -> jnp.ndarray:
    return jnp.exp(log_scales)


def scale_inverse_activation(scales: jnp.ndarray, eps: float = 1e-9) -> jnp.ndarray:
    return jnp.log(jnp.maximum(scales, eps))


def opacity_activation(logit_op: jnp.ndarray) -> jnp.ndarray:
    return jax.nn.sigmoid(logit_op)


def opacity_inverse_activation(op: jnp.ndarray, eps: float = 1e-7) -> jnp.ndarray:
    op = jnp.clip(op, eps, 1.0 - eps)
    return jnp.log(op) - jnp.log1p(-op)
