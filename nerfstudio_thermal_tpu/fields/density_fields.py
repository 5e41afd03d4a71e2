"""Proposal density fields (density only).

Behavioral spec: reference `nerfstudio/fields/density_fields.py:34-121`
(HashMLPDensityField). `MLPDensityField` is the TPU-native alternative: a
frequency-encoded MLP with zero table lookups — on TPU v5e, XLA lowers hash
gathers to a ~serial path (~0.4 G rows/s measured), while MXU matmuls are
effectively free at these batch sizes, so proposal densities are cheaper as
pure compute (this mirrors MipNeRF-360's original MLP proposals).
"""

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from nerfstudio_thermal_tpu.data.scene_box import SceneBox
from nerfstudio_thermal_tpu.ops.activations import trunc_exp
from nerfstudio_thermal_tpu.ops.encodings import HashEncoding
from nerfstudio_thermal_tpu.ops.mlp import MLP


class HashMLPDensityField(nn.Module):
    aabb: Any
    num_layers: int = 2
    hidden_dim: int = 64
    use_linear: bool = False
    num_levels: int = 8
    max_res: int = 1024
    base_res: int = 16
    log2_hashmap_size: int = 18
    features_per_level: int = 2
    average_init_density: float = 1.0
    use_spatial_distortion: bool = True
    compute_dtype: jnp.dtype = jnp.float32
    use_pallas: bool = False

    @nn.compact
    def __call__(self, positions: jax.Array) -> jax.Array:
        """World positions [..., 3] -> density [..., 1] (fp32)."""
        if self.use_spatial_distortion:
            from nerfstudio_thermal_tpu.ops.spatial_distortions import SceneContraction

            positions = SceneContraction(order=jnp.inf)(positions)
            positions = (positions + 2.0) / 4.0
        else:
            positions = SceneBox.get_normalized_positions(
                positions, jnp.asarray(self.aabb)
            )
        selector = jnp.all((positions > 0.0) & (positions < 1.0), axis=-1)
        positions = positions * selector[..., None]
        flat = positions.reshape(-1, 3)

        encoded = HashEncoding(
            num_levels=self.num_levels,
            min_res=self.base_res,
            max_res=self.max_res,
            log2_hashmap_size=self.log2_hashmap_size,
            features_per_level=self.features_per_level,
            compute_dtype=self.compute_dtype,
            use_pallas=self.use_pallas,
            name="encoding",
        )(flat)
        if self.use_linear:
            h = nn.Dense(1, dtype=self.compute_dtype, param_dtype=jnp.float32)(encoded)
        else:
            h = MLP(
                num_layers=self.num_layers,
                layer_width=self.hidden_dim,
                out_dim=1,
                compute_dtype=self.compute_dtype,
                name="mlp",
            )(encoded)
        density_before = h.reshape(*positions.shape[:-1], 1).astype(jnp.float32)
        density = self.average_init_density * trunc_exp(density_before)
        return density * selector[..., None]


class MLPDensityField(nn.Module):
    """Frequency-encoded MLP density field (no table lookups; MXU-only)."""

    aabb: Any
    num_layers: int = 2
    hidden_dim: int = 64
    num_frequencies: int = 6
    average_init_density: float = 1.0
    use_spatial_distortion: bool = True
    compute_dtype: jnp.dtype = jnp.float32
    use_pallas: bool = False

    @nn.compact
    def __call__(self, positions: jax.Array) -> jax.Array:
        """World positions [..., 3] -> density [..., 1] (fp32)."""
        from nerfstudio_thermal_tpu.ops.encodings import NeRFEncoding

        if self.use_spatial_distortion:
            from nerfstudio_thermal_tpu.ops.spatial_distortions import SceneContraction

            positions = SceneContraction(order=jnp.inf)(positions)
            positions = (positions + 2.0) / 4.0
        else:
            positions = SceneBox.get_normalized_positions(
                positions, jnp.asarray(self.aabb)
            )
        selector = jnp.all((positions > 0.0) & (positions < 1.0), axis=-1)
        positions = positions * selector[..., None]
        flat = positions.reshape(-1, 3)

        if self.use_pallas:
            # encoding fused into the Pallas MLP kernel: no [N, enc] HBM tensor
            h = MLP(
                num_layers=self.num_layers,
                layer_width=self.hidden_dim,
                out_dim=1,
                compute_dtype=self.compute_dtype,
                fused=True,
                freq_encoding=(
                    self.num_frequencies, 0.0, self.num_frequencies - 1.0, True
                ),
                name="mlp",
            )(flat)
        else:
            encoded = NeRFEncoding(
                in_dim=3,
                num_frequencies=self.num_frequencies,
                min_freq_exp=0.0,
                max_freq_exp=self.num_frequencies - 1,
                include_input=True,
            )(flat).astype(self.compute_dtype)
            h = MLP(
                num_layers=self.num_layers,
                layer_width=self.hidden_dim,
                out_dim=1,
                compute_dtype=self.compute_dtype,
                name="mlp",
            )(encoded)
        density_before = h.reshape(*positions.shape[:-1], 1).astype(jnp.float32)
        density = self.average_init_density * trunc_exp(density_before)
        return density * selector[..., None]
