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
    def __call__(self, positions: jax.Array = None, ray_samples=None) -> jax.Array:
        """World positions [..., 3] (or ray_samples) -> density [..., 1] (fp32)."""
        if positions is None:
            positions = ray_samples.get_positions()
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
    fused_raymarch_input_grads: bool = True
    """False when the model stop-gradients proposal positions
    (proposal_camera_gradients=False): the fused backward then skips the
    whole input-gradient chain."""
    fused_raymarch: bool = False
    """Evaluate via ops/pallas/fused_mlp.fused_ray_mlp when called with
    ray_samples: positions + contraction + selector + encoding + MLP in one
    kernel, no [N, 3]/[N, enc]/[N, width] HBM intermediates. Narrow proposal
    stacks lose to XLA when only the MLP is fused (see MLP._fusable), but win
    once the whole position machinery folds in."""

    @nn.compact
    def __call__(self, positions: jax.Array = None, ray_samples=None) -> jax.Array:
        """World positions [..., 3] (or ray_samples) -> density [..., 1] (fp32)."""
        mlp = MLP(
            num_layers=self.num_layers,
            layer_width=self.hidden_dim,
            out_dim=1,
            compute_dtype=self.compute_dtype,
            fused=self.use_pallas,
            freq_encoding=(
                self.num_frequencies, 0.0, self.num_frequencies - 1.0, True
            ),
            ray_input_grads=self.fused_raymarch_input_grads,
            name="mlp",
        )
        if (
            ray_samples is not None
            and self.fused_raymarch
            and self.use_spatial_distortion
            and mlp.will_fuse_rays()
        ):
            sample_shape = ray_samples.starts.shape[:-1]
            num_samples = sample_shape[-1]
            origins = ray_samples.origins.reshape(-1, 3)
            dirs = ray_samples.directions.reshape(-1, 3)
            mids = ((ray_samples.starts + ray_samples.ends) * 0.5).reshape(-1, 1)
            h = mlp(None, rays=(origins, dirs, mids, num_samples))
            h = h.reshape(*sample_shape, 2)
            selector = h[..., 1:].astype(jnp.float32)
            density = self.average_init_density * trunc_exp(
                h[..., :1].astype(jnp.float32)
            )
            return density * selector
        if positions is None:
            positions = ray_samples.get_positions()
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

        # The MLP handles encoding placement itself: in-kernel when the fused
        # path engages, NeRFEncoding outside otherwise (same math/params).
        h = mlp(flat)
        density_before = h.reshape(*positions.shape[:-1], 1).astype(jnp.float32)
        density = self.average_init_density * trunc_exp(density_before)
        return density * selector[..., None]
