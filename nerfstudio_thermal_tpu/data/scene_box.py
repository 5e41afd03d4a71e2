"""Scene AABB.

Behavioral spec: reference `nerfstudio/data/scene_box.py` (`SceneBox`,
`get_normalized_positions`).
"""

import flax.struct
import jax
import jax.numpy as jnp


@flax.struct.dataclass
class SceneBox:
    """Axis-aligned scene bounding box. aabb: [2, 3] = [[min], [max]]."""

    aabb: jax.Array

    @staticmethod
    def get_normalized_positions(positions: jax.Array, aabb: jax.Array) -> jax.Array:
        """Map world positions into [0, 1]^3 w.r.t. the aabb."""
        aabb_lengths = aabb[1] - aabb[0]
        return (positions - aabb[0]) / aabb_lengths

    def within(self, positions: jax.Array) -> jax.Array:
        return jnp.all((positions > self.aabb[0]) & (positions < self.aabb[1]), axis=-1)
