"""Special activation functions.

Behavioral spec: reference `nerfstudio/field_components/activations.py:28-54`
(`trunc_exp`: exp forward, gradient computed with the input clamped to
[-15, 15] to prevent exploding gradients).
"""

import jax
import jax.numpy as jnp


@jax.custom_jvp
def trunc_exp(x):
    """exp(x) with the backward pass clipped: d/dx = exp(clamp(x, -15, 15))."""
    return jnp.exp(x)


@trunc_exp.defjvp
def _trunc_exp_jvp(primals, tangents):
    (x,) = primals
    (dx,) = tangents
    y = jnp.exp(x)
    dy = dx * jnp.exp(jnp.clip(x, -15.0, 15.0))
    return y, dy
