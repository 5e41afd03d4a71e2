"""TensoRF field: vector-matrix (VM) tensor decomposition.

Behavioral spec: reference `nerfstudio/fields/tensorf_field.py:30-143` —
density/color as sums over rank components of plane(i,j) x line(k) products
on three orthogonal axes; a linear basis projects color features before a
small MLP head with frequency-encoded directions.

TPU note: plane/line lookups are bilinear/linear interpolations implemented
as f32 row gathers (channel-last rows) — acceptable at TensoRF's grid sizes.
"""

from typing import Any, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from nerfstudio_thermal_tpu.cameras.rays import RaySamples
from nerfstudio_thermal_tpu.data.scene_box import SceneBox
from nerfstudio_thermal_tpu.fields.base_field import FieldHeadNames
from nerfstudio_thermal_tpu.ops.encodings import NeRFEncoding
from nerfstudio_thermal_tpu.ops.mlp import MLP

# (plane axes, line axis) per component, matching TensoRF's matMode/vecMode
_PLANE_AXES = ((0, 1), (0, 2), (1, 2))
_LINE_AXES = (2, 1, 0)


def _bilinear_plane(plane: jax.Array, u: jax.Array, v: jax.Array) -> jax.Array:
    """plane [R, R, C]; u, v in [0, R-1] continuous -> [N, C]."""
    r = plane.shape[0]
    u0 = jnp.clip(jnp.floor(u).astype(jnp.int32), 0, r - 1)
    v0 = jnp.clip(jnp.floor(v).astype(jnp.int32), 0, r - 1)
    u1 = jnp.minimum(u0 + 1, r - 1)
    v1 = jnp.minimum(v0 + 1, r - 1)
    fu = (u - u0)[..., None]
    fv = (v - v0)[..., None]
    flat = plane.reshape(r * r, -1)
    p00 = flat[u0 * r + v0]
    p01 = flat[u0 * r + v1]
    p10 = flat[u1 * r + v0]
    p11 = flat[u1 * r + v1]
    return (
        p00 * (1 - fu) * (1 - fv)
        + p01 * (1 - fu) * fv
        + p10 * fu * (1 - fv)
        + p11 * fu * fv
    )


def _linear_line(line: jax.Array, w: jax.Array) -> jax.Array:
    """line [R, C]; w in [0, R-1] -> [N, C]."""
    r = line.shape[0]
    w0 = jnp.clip(jnp.floor(w).astype(jnp.int32), 0, r - 1)
    w1 = jnp.minimum(w0 + 1, r - 1)
    fw = (w - w0)[..., None]
    return line[w0] * (1 - fw) + line[w1] * fw


class TensoRFField(nn.Module):
    aabb: Any
    resolution: int = 128
    density_components: int = 16
    color_components: int = 48
    appearance_dim: int = 27
    head_mlp_layers: int = 2
    head_mlp_width: int = 128
    compute_dtype: jnp.dtype = jnp.float32

    def setup(self):
        r, cd, cc = self.resolution, self.density_components, self.color_components
        init = nn.initializers.normal(stddev=0.1)
        self.density_planes = self.param("density_planes", init, (3, r, r, cd))
        self.density_lines = self.param("density_lines", init, (3, r, cd))
        self.color_planes = self.param("color_planes", init, (3, r, r, cc))
        self.color_lines = self.param("color_lines", init, (3, r, cc))
        self.basis = nn.Dense(self.appearance_dim, use_bias=False,
                              dtype=self.compute_dtype, param_dtype=jnp.float32)
        self.direction_encoding = NeRFEncoding(
            in_dim=3, num_frequencies=2, min_freq_exp=0.0, max_freq_exp=1.0,
            include_input=True,
        )
        self.mlp_head = MLP(
            num_layers=self.head_mlp_layers,
            layer_width=self.head_mlp_width,
            out_dim=3,
            out_activation=nn.sigmoid,
            compute_dtype=self.compute_dtype,
        )

    def _normalized(self, positions):
        norm = SceneBox.get_normalized_positions(positions, jnp.asarray(self.aabb))
        selector = jnp.all((norm > 0.0) & (norm < 1.0), axis=-1)
        return jnp.clip(norm, 0.0, 1.0), selector

    def _vm_features(self, norm_flat, planes, lines):
        """[N, 3] normalized -> [N, 3, C] per-axis plane*line products."""
        r = planes.shape[1]
        coords = norm_flat * (r - 1)
        feats = []
        for k in range(3):
            i, j = _PLANE_AXES[k]
            l = _LINE_AXES[k]
            p = _bilinear_plane(planes[k], coords[:, i], coords[:, j])
            v = _linear_line(lines[k], coords[:, l])
            feats.append(p * v)
        return jnp.stack(feats, axis=1)  # [N, 3, C]

    def get_density(self, positions: jax.Array) -> Tuple[jax.Array, jax.Array]:
        shape = positions.shape[:-1]
        norm, selector = self._normalized(positions)
        flat = norm.reshape(-1, 3)
        feats = self._vm_features(flat, self.density_planes, self.density_lines)
        density = nn.relu(jnp.sum(feats, axis=(1, 2))).reshape(*shape, 1)
        return density * selector[..., None], None

    def density_fn(self, positions: jax.Array) -> jax.Array:
        return self.get_density(positions)[0]

    def __call__(self, ray_samples: RaySamples, train: bool = True) -> dict:
        positions = ray_samples.get_positions()
        shape = positions.shape[:-1]
        density, _ = self.get_density(positions)

        norm, _ = self._normalized(positions)
        flat = norm.reshape(-1, 3)
        color_feats = self._vm_features(flat, self.color_planes, self.color_lines)
        color_feats = color_feats.reshape(flat.shape[0], -1).astype(self.compute_dtype)
        appearance = self.basis(color_feats)

        d = self.direction_encoding(
            jnp.broadcast_to(
                ray_samples.directions[..., None, :], (*shape, 3)
            ).reshape(-1, 3)
        ).astype(self.compute_dtype)
        rgb = self.mlp_head(jnp.concatenate([appearance, d], axis=-1))
        rgb = rgb.astype(jnp.float32).reshape(*shape, 3)
        return {FieldHeadNames.DENSITY: density, FieldHeadNames.RGB: rgb}
