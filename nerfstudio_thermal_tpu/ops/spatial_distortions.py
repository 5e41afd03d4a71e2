"""Spatial distortions (unbounded-scene contraction).

Behavioral spec: reference `nerfstudio/field_components/spatial_distortions.py:42-90`
(MipNeRF-360 contraction; with order=inf space contracts to a cube of side 4).
"""

from typing import Optional, Union

import jax.numpy as jnp


class SceneContraction:
    """MipNeRF-360 scene contraction.

    f(x) = x                      if ||x|| <= 1
           (2 - 1/||x||) x/||x||  otherwise

    Args:
        order: Norm order. None = L2 (sphere of radius 2); jnp.inf = L-inf
            (cube of side 4, recommended for hash-grid encodings).
    """

    def __init__(self, order: Optional[Union[float, int]] = None) -> None:
        self.order = order

    def __call__(self, positions):
        if self.order is None:
            mag = jnp.linalg.norm(positions, axis=-1, keepdims=True)
        elif self.order == float("inf"):
            mag = jnp.max(jnp.abs(positions), axis=-1, keepdims=True)
        else:
            mag = jnp.linalg.norm(positions, ord=self.order, axis=-1, keepdims=True)
        # Guard the division so the untaken branch cannot produce NaN gradients.
        safe_mag = jnp.maximum(mag, 1e-12)
        contracted = (2.0 - 1.0 / safe_mag) * (positions / safe_mag)
        return jnp.where(mag < 1.0, positions, contracted)
