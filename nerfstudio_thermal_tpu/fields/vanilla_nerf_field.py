"""Classic NeRF field: frequency encodings + skip-connected MLP.

Behavioral spec: reference `nerfstudio/fields/vanilla_nerf_field.py:30-108`
(position encoding 10 freqs + include_input, direction encoding 4 freqs,
8x256 base MLP with skip at 4, 2x128 head MLP, relu density).
"""

from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from nerfstudio_thermal_tpu.cameras.rays import RaySamples
from nerfstudio_thermal_tpu.fields.base_field import FieldHeadNames
from nerfstudio_thermal_tpu.ops.encodings import NeRFEncoding
from nerfstudio_thermal_tpu.ops.mlp import MLP


class NeRFField(nn.Module):
    position_num_frequencies: int = 10
    direction_num_frequencies: int = 4
    base_mlp_num_layers: int = 8
    base_mlp_layer_width: int = 256
    head_mlp_num_layers: int = 2
    head_mlp_layer_width: int = 128
    skip_connections: Tuple[int, ...] = (4,)
    use_integrated_encoding: bool = False
    """MipNeRF: encode conical-frustum gaussians instead of points
    (reference vanilla_nerf_field.py:56,86-90)."""
    compute_dtype: jnp.dtype = jnp.float32
    use_pallas: bool = False

    def setup(self):
        self.position_encoding = NeRFEncoding(
            in_dim=3,
            num_frequencies=self.position_num_frequencies,
            min_freq_exp=0.0,
            max_freq_exp=self.position_num_frequencies - 1,
            include_input=True,
        )
        self.direction_encoding = NeRFEncoding(
            in_dim=3,
            num_frequencies=self.direction_num_frequencies,
            min_freq_exp=0.0,
            max_freq_exp=self.direction_num_frequencies - 1,
            include_input=True,
        )
        self.mlp_base = MLP(
            num_layers=self.base_mlp_num_layers,
            layer_width=self.base_mlp_layer_width,
            out_dim=self.base_mlp_layer_width,
            skip_connections=self.skip_connections,
            compute_dtype=self.compute_dtype,
            fused=self.use_pallas,
        )
        self.density_head = nn.Dense(1, dtype=self.compute_dtype, param_dtype=jnp.float32)
        self.mlp_head = MLP(
            num_layers=self.head_mlp_num_layers,
            layer_width=self.head_mlp_layer_width,
            out_dim=3,
            out_activation=nn.sigmoid,
            compute_dtype=self.compute_dtype,
        )

    def __call__(self, ray_samples: RaySamples, train: bool = True) -> dict:
        if self.use_integrated_encoding:
            means, cov_diag = ray_samples.get_gaussian_blob()
            shape = means.shape[:-1]
            enc = self.position_encoding(
                means.reshape(-1, 3), covs=cov_diag.reshape(-1, 3)
            ).astype(self.compute_dtype)
        else:
            positions = ray_samples.get_positions()
            shape = positions.shape[:-1]
            enc = self.position_encoding(positions.reshape(-1, 3)).astype(self.compute_dtype)
        base = self.mlp_base(enc)
        density = nn.softplus(
            self.density_head(base).astype(jnp.float32)
        ).reshape(*shape, 1)

        d = self.direction_encoding(
            jnp.broadcast_to(
                ray_samples.directions[..., None, :], (*shape, 3)
            ).reshape(-1, 3)
        ).astype(self.compute_dtype)
        rgb = self.mlp_head(jnp.concatenate([base, d], axis=-1))
        rgb = rgb.astype(jnp.float32).reshape(*shape, 3)
        return {FieldHeadNames.DENSITY: density, FieldHeadNames.RGB: rgb}
