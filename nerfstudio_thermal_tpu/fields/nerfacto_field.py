"""Nerfacto field: hash-grid base MLP + SH-conditioned color head.

Behavioral spec: reference `nerfstudio/fields/nerfacto_field.py:43-348` and
the fork's `fields/thermal_nerfacto_field.py:10-99` (identical except the
color head emits `num_channels` in {1, 3, 4}: 1 = thermal-only field,
4 = shared RGBT head). The two are one module here with a `num_channels`
knob, so ThermalNerfactoField is an alias.

Numerics notes:
- Density path: contraction -> (x+2)/4 -> out-of-box selector zeroing ->
  hash+MLP -> fp32 trunc_exp * average_init_density * selector
  (reference :205-229). Density is computed in fp32 even when the MLP runs
  bf16, matching the reference's fp16-tcnn/fp32-density split (:224-227).
- Direction encoding: the reference's tcnn path evaluates SH on true unit
  directions (tcnn internally undoes the [0,1] shift of
  `get_normalized_directions`); its torch fallback evaluates SH on the
  shifted values. We follow the tcnn (production) semantics: SH on unit
  directions.
"""

from typing import Any, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from nerfstudio_thermal_tpu.cameras.rays import RaySamples
from nerfstudio_thermal_tpu.data.scene_box import SceneBox
from nerfstudio_thermal_tpu.fields.base_field import FieldHeadNames
from nerfstudio_thermal_tpu.ops.activations import trunc_exp
from nerfstudio_thermal_tpu.ops.encodings import SHEncoding
from nerfstudio_thermal_tpu.ops.mlp import MLP, MLPWithHashEncoding


class NerfactoField(nn.Module):
    """Compound field. aabb is a static (2, 3) array-like."""

    aabb: Any
    num_images: int
    num_layers: int = 2
    hidden_dim: int = 64
    geo_feat_dim: int = 15
    num_levels: int = 16
    base_res: int = 16
    max_res: int = 2048
    log2_hashmap_size: int = 19
    num_layers_color: int = 3
    features_per_level: int = 2
    hidden_dim_color: int = 64
    appearance_embedding_dim: int = 32
    use_average_appearance_embedding: bool = False
    use_spatial_distortion: bool = True  # SceneContraction(order=inf)
    average_init_density: float = 1.0
    num_channels: int = 3
    num_semantic_classes: int = 0
    """>0 adds a semantic head over the geo features
    (reference nerfacto_field.py use_semantics / semantic_nerfw)."""
    pass_semantic_gradients: bool = False
    compute_dtype: jnp.dtype = jnp.float32
    use_pallas: bool = False
    fused_raymarch: bool = False
    """get_density_from_rays folds position generation + contraction +
    selector into the fused Pallas kernel (fused_ray_mlp)."""
    fused_field: bool = False
    """__call__ runs the WHOLE field (ray-march + base MLP + SH + appearance
    + color head) as one Pallas kernel (fused_field_mlp): geo features, SH
    components, and head inputs never exist in HBM. Requires the
    fused_raymarch preconditions plus an appearance embedding and no
    semantic head."""
    field_encoding: str = "hash"
    """'hash' = Instant-NGP grid (reference parity); 'freq' = frequency-encoded
    deep MLP base — the TPU-native compute-dense option (hash gathers lower to
    a ~serial XLA path on v5e; MXU matmuls are effectively free)."""
    freq_num_frequencies: int = 10
    freq_num_layers: int = 8
    freq_hidden_dim: int = 256
    freq_use_skip: bool = True
    freq_final_init_scale: float = 1.0
    """Init scale for the base MLP's final layer (see ops/mlp.py
    final_init_scale): <1 starts the freq field's density near-uniform like
    the hash table's near-zero init, avoiding seed-dependent early density
    collapse on few-view scenes."""
    """NeRF-style skip connection at the middle layer. Off in the TPU
    flagship: the 63->319 concat forces layout copies and odd-width matmuls
    (measured 5.9 -> 4.1 ms per base fwd+bwd pass without it)."""

    def setup(self):
        self.direction_encoding = SHEncoding(levels=4)
        if self.field_encoding == "freq":
            from nerfstudio_thermal_tpu.ops.encodings import NeRFEncoding

            self.position_encoding = NeRFEncoding(
                in_dim=3,
                num_frequencies=self.freq_num_frequencies,
                min_freq_exp=0.0,
                max_freq_exp=self.freq_num_frequencies - 1,
                include_input=True,
            )
            # With Pallas the encoding runs inside the fused kernel (the
            # [N, enc] tensor never exists in HBM); otherwise it's applied in
            # get_density before the XLA MLP.
            self.mlp_base_net = MLP(
                num_layers=self.freq_num_layers,
                layer_width=self.freq_hidden_dim,
                out_dim=1 + self.geo_feat_dim,
                skip_connections=(
                    (self.freq_num_layers // 2,) if self.freq_use_skip else ()
                ),
                compute_dtype=self.compute_dtype,
                fused=self.use_pallas,
                final_init_scale=self.freq_final_init_scale,
                freq_encoding=(
                    (self.freq_num_frequencies, 0.0,
                     self.freq_num_frequencies - 1.0, True)
                    if self.use_pallas
                    else None
                ),
            )
        else:
            self.mlp_base = MLPWithHashEncoding(
                num_levels=self.num_levels,
                min_res=self.base_res,
                max_res=self.max_res,
                log2_hashmap_size=self.log2_hashmap_size,
                features_per_level=self.features_per_level,
                num_layers=self.num_layers,
                layer_width=self.hidden_dim,
                out_dim=1 + self.geo_feat_dim,
                compute_dtype=self.compute_dtype,
                use_pallas=self.use_pallas,
            )
        if self.appearance_embedding_dim > 0:
            # Direct param (not a submodule) so the eval path can average the
            # table (reference nerfacto_field.py:295-305).
            self.appearance_table = self.param(
                "embedding_appearance",
                nn.initializers.normal(stddev=1.0),
                (self.num_images, self.appearance_embedding_dim),
            )
        self.mlp_head = MLP(
            num_layers=self.num_layers_color,
            layer_width=self.hidden_dim_color,
            out_dim=self.num_channels,
            out_activation=nn.sigmoid,
            compute_dtype=self.compute_dtype,
            fused=self.use_pallas,
        )
        if self.num_semantic_classes > 0:
            # semantic head over geo features (reference nerfacto_field.py
            # mlp_semantics: 2-layer 64-wide + SemanticFieldHead)
            self.mlp_semantics = MLP(
                num_layers=2,
                layer_width=64,
                out_dim=self.num_semantic_classes,
                compute_dtype=self.compute_dtype,
            )

    def _normalize_positions(self, positions: jax.Array) -> Tuple[jax.Array, jax.Array]:
        """World positions -> [0,1]^3 hash-grid coords + in-box selector
        (reference nerfacto_field.py:207-218)."""
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
        return positions, selector

    def get_density(self, positions: jax.Array) -> Tuple[jax.Array, jax.Array]:
        """positions [..., 3] world -> (density [..., 1] fp32, geo feats
        [..., geo_feat_dim])."""
        positions, selector = self._normalize_positions(positions)
        flat = positions.reshape(-1, 3)
        if self.field_encoding == "freq":
            if self.use_pallas:
                h = self.mlp_base_net(flat)  # encoding fused in-kernel
            else:
                h = self.mlp_base_net(
                    self.position_encoding(flat).astype(self.compute_dtype)
                )
        else:
            h = self.mlp_base(flat)
        h = h.reshape(*positions.shape[:-1], h.shape[-1])
        density_before, geo_feat = h[..., :1], h[..., 1:]
        density = self.average_init_density * trunc_exp(
            density_before.astype(jnp.float32)
        )
        density = density * selector[..., None]
        return density, geo_feat

    def density_fn(self, positions: jax.Array) -> jax.Array:
        return self.get_density(positions)[0]

    def get_density_from_rays(
        self, ray_samples: RaySamples
    ) -> Tuple[jax.Array, jax.Array]:
        """Fused ray-march density: position generation, contraction,
        selector, encoding, and the base MLP run in one Pallas kernel
        (ops/pallas/fused_mlp.fused_ray_mlp) — the per-sample [R, S, 3]
        position tensor never exists in HBM. Numerically identical to
        get_density(ray_samples.get_positions()); falls back to it when the
        config can't fuse (hash fields, no contraction, non-relu)."""
        fusable = (
            self.fused_raymarch
            and self.field_encoding == "freq"
            and self.use_spatial_distortion
            and self.use_pallas
            and self.mlp_base_net.will_fuse_rays()
        )
        if not fusable:
            return self.get_density(ray_samples.get_positions())
        sample_shape = ray_samples.starts.shape[:-1]
        num_samples = sample_shape[-1]
        origins = ray_samples.origins.reshape(-1, 3)
        dirs = ray_samples.directions.reshape(-1, 3)
        mids = ((ray_samples.starts + ray_samples.ends) * 0.5).reshape(-1, 1)
        h = self.mlp_base_net(None, rays=(origins, dirs, mids, num_samples))
        h = h.reshape(*sample_shape, h.shape[-1])
        selector = h[..., -1:]
        density_before, geo_feat = h[..., :1], h[..., 1:-1]
        density = self.average_init_density * trunc_exp(
            density_before.astype(jnp.float32)
        )
        density = density * selector.astype(jnp.float32)
        return density, geo_feat

    def get_outputs(
        self,
        ray_samples: RaySamples,
        geo_feat: jax.Array,
        train: bool = True,
    ) -> jax.Array:
        """Color head: SH(dir) ++ geo_feat ++ appearance embed -> MLP -> sigmoid
        (reference nerfacto_field.py:272-348)."""
        from nerfstudio_thermal_tpu.utils.math import broadcast_rows_mxu

        directions = ray_samples.directions  # unit
        sample_shape = ray_samples.starts.shape[:-1]
        num_samples = sample_shape[-1]
        d = self.direction_encoding(directions)
        # per-ray -> per-sample via the matmul-repeat (broadcast_rows_mxu):
        # broadcast_to's VJP reduces an [R, S, K] tensor with K=16/32 in the
        # lane dim (~1 ms/step on v5e); the matmul VJP rides the MXU
        d = broadcast_rows_mxu(d.reshape(-1, d.shape[-1]), num_samples)

        parts = [d, geo_feat.reshape(-1, self.geo_feat_dim)]
        if self.appearance_embedding_dim > 0:
            cam_idx = ray_samples.camera_indices[..., 0]
            if train:
                emb = self.appearance_table[cam_idx]
            else:
                if self.use_average_appearance_embedding:
                    emb = jnp.broadcast_to(
                        jnp.mean(self.appearance_table, axis=0),
                        (*cam_idx.shape, self.appearance_embedding_dim),
                    )
                else:
                    emb = jnp.zeros((*cam_idx.shape, self.appearance_embedding_dim))
            parts.append(
                broadcast_rows_mxu(
                    emb.reshape(-1, self.appearance_embedding_dim), num_samples
                )
            )

        h = jnp.concatenate(parts, axis=-1)
        rgb = self.mlp_head(h).reshape(*sample_shape, self.num_channels)
        return rgb.astype(jnp.float32)

    def _fused_field_ok(self) -> bool:
        return (
            self.fused_field
            and self.fused_raymarch
            and self.field_encoding == "freq"
            and self.use_spatial_distortion
            and self.use_pallas
            and self.appearance_embedding_dim > 0
            and self.num_semantic_classes == 0
            and self.mlp_base_net.will_fuse_rays()
        )

    def _fused_field_forward(self, ray_samples: RaySamples, train: bool) -> dict:
        """Whole-field Pallas kernel (ops/pallas/fused_mlp.fused_field_mlp):
        identical math to get_density_from_rays + get_outputs."""
        from nerfstudio_thermal_tpu.ops.pallas.fused_mlp import fused_field_mlp

        sample_shape = ray_samples.starts.shape[:-1]
        num_samples = sample_shape[-1]
        origins = ray_samples.origins.reshape(-1, 3).astype(jnp.float32)
        dirs = ray_samples.directions.reshape(-1, 3).astype(jnp.float32)
        mids = (
            (ray_samples.starts + ray_samples.ends) * 0.5
        ).reshape(-1, 1).astype(jnp.float32)
        cam_idx = ray_samples.camera_indices[..., 0].reshape(-1)
        if train:
            emb = self.appearance_table[cam_idx]
        elif self.use_average_appearance_embedding:
            emb = jnp.broadcast_to(
                jnp.mean(self.appearance_table, axis=0),
                (cam_idx.shape[0], self.appearance_embedding_dim),
            )
        else:
            emb = jnp.zeros((cam_idx.shape[0], self.appearance_embedding_dim))

        mlp = self.mlp_base_net
        base_ws, base_bs = mlp(None, export_params=mlp._enc_dim())
        head_in = 16 + self.geo_feat_dim + self.appearance_embedding_dim
        head_ws, head_bs = self.mlp_head(None, export_params=head_in)
        out = fused_field_mlp(
            origins, dirs, mids, emb.astype(jnp.float32),
            base_ws, base_bs, head_ws, head_bs,
            num_samples,
            mlp.fused_block_size,
            jax.default_backend() == "cpu",
            tuple(sorted(set(mlp.skip_connections))),
            mlp.freq_encoding,
            jnp.dtype(self.compute_dtype).name,
        )
        c = self.num_channels
        out = out.reshape(*sample_shape, c + 2)
        rgb = out[..., :c].astype(jnp.float32)
        raw = out[..., c : c + 1].astype(jnp.float32)
        selector = out[..., c + 1 :].astype(jnp.float32)
        density = self.average_init_density * trunc_exp(raw) * selector
        return {FieldHeadNames.DENSITY: density, FieldHeadNames.RGB: rgb}

    def __call__(self, ray_samples: RaySamples, train: bool = True) -> dict:
        """Full field forward (reference base_field.py forward)."""
        if self._fused_field_ok():
            return self._fused_field_forward(ray_samples, train)
        density, geo_feat = self.get_density_from_rays(ray_samples)
        rgb = self.get_outputs(ray_samples, geo_feat, train=train)
        out = {FieldHeadNames.DENSITY: density, FieldHeadNames.RGB: rgb}
        if self.num_semantic_classes > 0:
            feat = geo_feat
            if not self.pass_semantic_gradients:
                feat = jax.lax.stop_gradient(feat)
            sem = self.mlp_semantics(feat.reshape(-1, self.geo_feat_dim))
            out[FieldHeadNames.SEMANTICS] = sem.reshape(
                *geo_feat.shape[:-1], self.num_semantic_classes
            ).astype(jnp.float32)
        return out

    def sample_and_density(self, rng: jax.Array, num_points: int, voxel_size: float):
        """Density at random points + their 6 axis neighbors, for the TV
        density loss (reference nerfacto_field.py:231-270). Returns
        [7 * num_points, 1] densities (points first, then neighbor blocks)."""
        aabb = jnp.asarray(self.aabb, jnp.float32)
        pts = jax.random.uniform(rng, (num_points, 3))
        scaled = aabb[0] + (aabb[1] - aabb[0]) * pts
        width = (aabb[1] - aabb[0]) / voxel_size
        offsets = jnp.asarray(
            [
                [1, 0, 0], [-1, 0, 0],
                [0, 1, 0], [0, -1, 0],
                [0, 0, 1], [0, 0, -1],
            ],
            jnp.float32,
        )
        neighbors = scaled[None, :, :] - offsets[:, None, :] * width
        all_points = jnp.concatenate([scaled[None], neighbors], axis=0).reshape(-1, 3)
        # Match reference get_density_only: positions used directly with the
        # in-unit-box selector (no contraction), density without
        # average_init_density scaling.
        selector = jnp.all((all_points > 0.0) & (all_points < 1.0), axis=-1)
        positions = all_points * selector[..., None]
        if self.field_encoding == "freq":
            if self.use_pallas:
                # fused path encodes in-kernel: feed raw coordinates
                h = self.mlp_base_net(positions)
            else:
                h = self.mlp_base_net(
                    self.position_encoding(positions).astype(self.compute_dtype)
                )
        else:
            h = self.mlp_base(positions)
        return trunc_exp(h[..., :1].astype(jnp.float32))


# The fork's field is the same module with num_channels in {1, 3, 4}
# (reference fields/thermal_nerfacto_field.py:10-99).
ThermalNerfactoField = NerfactoField
