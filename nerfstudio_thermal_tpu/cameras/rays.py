"""Ray containers as JAX pytrees.

Behavioral spec: reference `nerfstudio/cameras/rays.py` (`RayBundle:32`,
`RaySamples:106`, `get_weights:128-150`). Frustums are flattened into the
RaySamples struct (starts/ends/origins/directions) — rays are immutable values
here, so no deepcopy dance is needed (reference thermal_nerfacto.py:407).

Spacing warps are identified by a static string so RaySamples remains a valid
pytree under jit (the reference carries a `spacing_to_euclidean_fn` closure).
"""

from typing import Dict, Optional

import flax.struct
import jax
import jax.numpy as jnp


def spacing_fn(kind: str, x):
    """Spacing warp s(t) (reference ray_samplers.py:146-247)."""
    if kind == "uniform":
        return x
    if kind == "lindisp":
        return 1.0 / x
    if kind == "sqrt":
        return jnp.sqrt(x)
    if kind == "log":
        return jnp.log(x)
    if kind == "piecewise":
        return jnp.where(x < 1, x / 2.0, 1.0 - 1.0 / (2.0 * x))
    raise ValueError(f"unknown spacing kind {kind}")


def spacing_fn_inv(kind: str, x):
    """Inverse spacing warp t(s)."""
    if kind == "uniform":
        return x
    if kind == "lindisp":
        return 1.0 / x
    if kind == "sqrt":
        return x**2
    if kind == "log":
        return jnp.exp(x)
    if kind == "piecewise":
        return jnp.where(x < 0.5, 2.0 * x, 1.0 / (2.0 - 2.0 * x))
    raise ValueError(f"unknown spacing kind {kind}")


@flax.struct.dataclass
class RayBundle:
    """A batch of rays. All leading dims are the ray batch shape."""

    origins: jax.Array  # [..., 3]
    directions: jax.Array  # [..., 3] (unit)
    pixel_area: jax.Array  # [..., 1]
    camera_indices: jax.Array  # [..., 1] int32
    nears: Optional[jax.Array] = None  # [..., 1]
    fars: Optional[jax.Array] = None  # [..., 1]
    metadata: Dict[str, jax.Array] = flax.struct.field(default_factory=dict)
    times: Optional[jax.Array] = None  # [..., 1]

    @property
    def shape(self):
        return self.origins.shape[:-1]

    def get_ray_samples(
        self,
        bin_starts: jax.Array,  # [..., S, 1] euclidean
        bin_ends: jax.Array,  # [..., S, 1]
        spacing_starts: jax.Array,  # [..., S, 1] in [0, 1]
        spacing_ends: jax.Array,  # [..., S, 1]
        spacing_kind: str,
        s_near: jax.Array,  # [..., 1] spacing_fn(nears)
        s_far: jax.Array,  # [..., 1]
    ) -> "RaySamples":
        """Build RaySamples from bin edges (reference rays.py:251-295)."""
        return RaySamples(
            origins=self.origins,
            directions=self.directions,
            pixel_area=self.pixel_area,
            camera_indices=self.camera_indices,
            starts=bin_starts,
            ends=bin_ends,
            spacing_starts=spacing_starts,
            spacing_ends=spacing_ends,
            spacing_kind=spacing_kind,
            s_near=s_near,
            s_far=s_far,
            metadata=self.metadata,
            times=self.times,
        )


@flax.struct.dataclass
class RaySamples:
    """Samples along a ray batch. [..., S] sample dims, rays broadcast."""

    origins: jax.Array  # [..., 3]
    directions: jax.Array  # [..., 3]
    pixel_area: jax.Array  # [..., 1]
    camera_indices: jax.Array  # [..., 1] int32
    starts: jax.Array  # [..., S, 1] euclidean bin starts
    ends: jax.Array  # [..., S, 1]
    spacing_starts: jax.Array  # [..., S, 1] normalized [0,1]
    spacing_ends: jax.Array  # [..., S, 1]
    s_near: jax.Array  # [..., 1]
    s_far: jax.Array  # [..., 1]
    spacing_kind: str = flax.struct.field(pytree_node=False, default="uniform")
    metadata: Dict[str, jax.Array] = flax.struct.field(default_factory=dict)
    times: Optional[jax.Array] = None

    @property
    def shape(self):
        return self.starts.shape[:-1]

    @property
    def deltas(self) -> jax.Array:
        return self.ends - self.starts

    def get_positions(self) -> jax.Array:
        """Sample midpoints in world space (reference rays.py:85-91)."""
        mids = (self.starts + self.ends) / 2.0  # [..., S, 1]
        return self.origins[..., None, :] + self.directions[..., None, :] * mids

    def get_gaussian_blob(self):
        """Conical-frustum gaussian approximation (means, cov_diag) for
        integrated positional encodings (reference rays.py:72-88; cone radius
        chosen so the square pixel area matches the cone area)."""
        from nerfstudio_thermal_tpu.utils.math import conical_frustum_to_gaussian_diag

        cone_radius = jnp.sqrt(self.pixel_area) / 1.7724538509055159
        return conical_frustum_to_gaussian_diag(
            origins=self.origins[..., None, :],
            directions=self.directions[..., None, :],
            starts=self.starts,
            ends=self.ends,
            radius=cone_radius[..., None, :],
        )

    def spacing_to_euclidean(self, s: jax.Array) -> jax.Array:
        """Map normalized spacing in [0,1] to euclidean distance."""
        return spacing_fn_inv(
            self.spacing_kind, s * self.s_far + (1.0 - s) * self.s_near
        )

    def get_weights(self, densities: jax.Array) -> jax.Array:
        """Alpha-compositing weights from densities.

        Spec: reference rays.py:128-150 — transmittance from the *exclusive*
        cumulative sum of delta*density.
        """
        from nerfstudio_thermal_tpu.utils.math import cumsum_mxu

        delta_density = self.deltas * densities  # [..., S, 1]
        alphas = 1.0 - jnp.exp(-delta_density)
        # exclusive scan as an MXU matmul (cumsum_mxu) — XLA's reduce-window
        # lowering of cumsum costs ~180 us/level on v5e
        trans = jnp.exp(-cumsum_mxu(delta_density, axis=-2, exclusive=True))
        weights = alphas * trans
        return jnp.nan_to_num(weights)


def get_weights_and_transmittance_from_alphas(alphas: jax.Array):
    """weights, transmittance from per-sample alphas (reference rays.py:152-189)."""
    trans = jnp.cumprod(
        jnp.concatenate(
            [jnp.ones_like(alphas[..., :1, :]), 1.0 - alphas + 1e-7], axis=-2
        ),
        axis=-2,
    )[..., :-1, :]
    weights = alphas * trans
    return weights, trans
