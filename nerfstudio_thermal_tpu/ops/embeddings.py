"""Per-image (appearance) embeddings.

Behavioral spec: reference `nerfstudio/field_components/embedding.py` (a plain
nn.Embedding; used as the 32-d appearance code in nerfacto fields).
"""

import flax.linen as nn
import jax
import jax.numpy as jnp


class Embedding(nn.Module):
    """Index -> learned vector table."""

    num_embeddings: int
    features: int

    @nn.compact
    def __call__(self, indices: jax.Array) -> jax.Array:
        table = self.param(
            "embedding",
            nn.initializers.normal(stddev=1.0),
            (self.num_embeddings, self.features),
        )
        return table[indices]

    def mean(self, params) -> jax.Array:
        """Mean embedding (used at eval when use_average_appearance_embedding)."""
        return jnp.mean(params["embedding"], axis=0)
