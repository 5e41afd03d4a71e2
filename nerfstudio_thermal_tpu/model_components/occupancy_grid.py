"""Occupancy grid for empty-space skipping (instant-ngp).

Behavioral spec being replaced: reference `nerfstudio/model_components/
ray_samplers.py:386-521` (`VolumetricSampler` over nerfacc's CUDA
OccGridEstimator producing variable-length packed samples).

TPU-native formulation: packed/jagged rays are hostile to XLA's static
shapes, so occupancy works by *masking* instead of *packing* — rays keep a
fixed sample count; densities are zeroed where the grid marks empty space,
which collapses their compositing weights exactly as skipping would. The
grid itself is a dense [res^3] EMA of sampled densities, thresholded on
query; it lives in the TrainState and updates inside the jitted step on a
cadence (reference updates every 16 steps).
"""

from typing import Callable, Tuple

import flax.struct
import jax
import jax.numpy as jnp


@flax.struct.dataclass
class OccupancyGridState:
    densities: jax.Array  # [res^3] EMA of density samples
    resolution: int = flax.struct.field(pytree_node=False, default=128)
    aabb: Tuple = flax.struct.field(
        pytree_node=False, default=((-1, -1, -1), (1, 1, 1))
    )


def create_occupancy_grid(resolution: int = 128, aabb=((-1, -1, -1), (1, 1, 1))):
    return OccupancyGridState(
        densities=jnp.zeros((resolution**3,), jnp.float32),
        resolution=resolution,
        aabb=tuple(map(tuple, aabb)),
    )


def _cell_index(grid: OccupancyGridState, positions: jax.Array) -> jax.Array:
    """World positions [..., 3] -> flat cell indices (clipped into the grid)."""
    aabb = jnp.asarray(grid.aabb, jnp.float32)
    res = grid.resolution
    norm = (positions - aabb[0]) / (aabb[1] - aabb[0])
    cell = jnp.clip((norm * res).astype(jnp.int32), 0, res - 1)
    return (cell[..., 0] * res + cell[..., 1]) * res + cell[..., 2]


def update_occupancy_grid(
    grid: OccupancyGridState,
    density_fn: Callable[[jax.Array], jax.Array],
    rng: jax.Array,
    num_samples: int = 2**18,
    ema_decay: float = 0.95,
) -> OccupancyGridState:
    """EMA-update a random subset of cells (nerfacc's every-16-steps update)."""
    res = grid.resolution
    aabb = jnp.asarray(grid.aabb, jnp.float32)
    k1, k2 = jax.random.split(rng)
    idx = jax.random.randint(k1, (num_samples,), 0, res**3)
    cz = idx % res
    cy = (idx // res) % res
    cx = idx // (res * res)
    cell = jnp.stack([cx, cy, cz], -1).astype(jnp.float32)
    jitter = jax.random.uniform(k2, (num_samples, 3))
    positions = aabb[0] + (cell + jitter) / res * (aabb[1] - aabb[0])
    density = density_fn(positions)[..., 0]
    decayed = grid.densities * ema_decay
    updated = decayed.at[idx].max(density)
    return grid.replace(densities=updated)


def occupancy_mask(
    grid: OccupancyGridState, positions: jax.Array, threshold: float = 1e-2
) -> jax.Array:
    """[..., 3] world positions -> float {0,1} mask [..., 1]."""
    idx = _cell_index(grid, positions)
    occ = grid.densities[idx] > threshold
    return occ.astype(jnp.float32)[..., None]
