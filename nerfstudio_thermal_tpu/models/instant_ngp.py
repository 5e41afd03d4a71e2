"""Instant-NGP: hash field + occupancy-grid empty-space skipping.

Behavioral spec: reference `nerfstudio/models/instant_ngp.py:60-270`
(NGP field, nerfacc occupancy grid updated every 16 steps, packed volumetric
sampling, random background). TPU-native sampling: fixed samples/ray with
occupancy *masking* (see model_components/occupancy_grid.py) instead of
variable-length packed rays.
"""

from dataclasses import dataclass, field as dataclass_field
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp

from nerfstudio_thermal_tpu.cameras.rays import RayBundle
from nerfstudio_thermal_tpu.fields.base_field import FieldHeadNames
from nerfstudio_thermal_tpu.fields.nerfacto_field import NerfactoField
from nerfstudio_thermal_tpu.model_components import renderers
from nerfstudio_thermal_tpu.model_components.losses import mse_loss
from nerfstudio_thermal_tpu.model_components.occupancy_grid import (
    OccupancyGridState,
    create_occupancy_grid,
    occupancy_mask,
    update_occupancy_grid,
)
from nerfstudio_thermal_tpu.model_components.ray_samplers import spaced_sample
from nerfstudio_thermal_tpu.model_components.scene_colliders import AABBBoxCollider
from nerfstudio_thermal_tpu.models.base_model import Model, ModelConfig
from nerfstudio_thermal_tpu.utils.math import psnr


@dataclass
class InstantNGPModelConfig(ModelConfig):
    """(reference instant_ngp.py:38-76)."""

    num_samples_per_ray: int = 192
    grid_resolution: int = 128
    grid_update_every: int = 16
    alpha_thre: float = 1e-2
    background_color: str = "random"
    near_plane: float = 0.05
    far_plane: float = 1000.0
    num_levels: int = 16
    max_res: int = 2048
    log2_hashmap_size: int = 19
    compute_dtype: str = "float32"
    use_pallas: bool = False
    disable_scene_contraction: bool = False
    appearance_embed_dim: int = 32


class InstantNGPModel(Model):
    config: InstantNGPModelConfig

    def populate_modules(self):
        cfg = self.config
        dtype = jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else jnp.float32
        self._compute_dtype = dtype
        self.field = NerfactoField(
            aabb=tuple(map(tuple, self.scene_aabb.tolist())),
            num_images=self.num_train_data,
            num_levels=cfg.num_levels,
            max_res=cfg.max_res,
            log2_hashmap_size=cfg.log2_hashmap_size,
            use_spatial_distortion=not cfg.disable_scene_contraction,
            appearance_embedding_dim=cfg.appearance_embed_dim,
            compute_dtype=dtype,
            use_pallas=cfg.use_pallas,
        )
        self.collider = AABBBoxCollider(
            jnp.asarray(self.scene_aabb), near_plane=cfg.near_plane
        )

    def init_params(self, rng: jax.Array) -> Dict[str, Any]:
        from nerfstudio_thermal_tpu.models.nerfacto import _dummy_ray_samples

        return {
            "fields": self.field.init(rng, _dummy_ray_samples(), train=True)["params"]
        }

    def init_occupancy_grid(self) -> OccupancyGridState:
        return create_occupancy_grid(
            self.config.grid_resolution, self.scene_aabb.tolist()
        )

    # --- Trainer extra-state hooks ---

    def init_extra_state(self):
        return self.init_occupancy_grid()

    def update_extra_state(self, params, extra, step, rng):
        every = self.config.grid_update_every
        return jax.lax.cond(
            step % every == 0,
            lambda: self.update_grid(params, extra, rng),
            lambda: extra,
        )

    def extra_forward_kwargs(self, extra):
        return {"occupancy_grid": extra}

    def update_grid(self, params, grid: OccupancyGridState, rng) -> OccupancyGridState:
        def density_fn(positions):
            return self.field.apply(
                {"params": params["fields"]},
                positions,
                method=self.field.density_fn,
            )

        return update_occupancy_grid(grid, density_fn, rng)

    def get_outputs(
        self,
        params,
        ray_bundle: RayBundle,
        *,
        train=True,
        rng=None,
        occupancy_grid: Optional[OccupancyGridState] = None,
        **_,
    ):
        cfg = self.config
        samples = spaced_sample(
            ray_bundle, cfg.num_samples_per_ray, spacing_kind="uniform",
            train=train, rng=rng,
        )
        field_out = self.field.apply(
            {"params": params["fields"]}, samples, train=train
        )
        density = field_out[FieldHeadNames.DENSITY]
        live_samples_per_ray = None
        if occupancy_grid is not None:
            mask = occupancy_mask(
                occupancy_grid, samples.get_positions(), cfg.alpha_thre
            )
            density = density * mask
            # mean live (unmasked) samples per ray: drives DynamicBatchPipeline
            # (the analogue of nerfacc's packed sample count the reference's
            # dynamic_batch.py:60-73 divides by)
            live_samples_per_ray = jnp.mean(jnp.sum(mask[..., 0], axis=-1))
        weights = samples.get_weights(density)
        rgb = renderers.render_rgb(
            field_out[FieldHeadNames.RGB], weights, cfg.background_color, train=train
        )
        out = {
            "rgb": rgb,
            "accumulation": renderers.render_accumulation(weights),
            "depth": renderers.render_depth_median(weights, samples),
            "expected_depth": renderers.render_depth_expected(weights, samples),
        }
        if train and live_samples_per_ray is not None:
            out["num_samples_per_ray"] = live_samples_per_ray
        return out

    def get_metrics_dict(self, params, outputs, batch, train=True):
        gt = renderers.blend_background_rgb(batch["image"])
        metrics = {"psnr": psnr(outputs["rgb"], gt)}
        if "num_samples_per_ray" in outputs:
            metrics["num_samples_per_ray"] = outputs["num_samples_per_ray"]
        return metrics

    def get_loss_dict(self, params, outputs, batch, metrics_dict, *, train=True, rng=None):
        pred, gt = renderers.blend_background_for_loss_rgb(
            outputs["rgb"], outputs["accumulation"], batch["image"],
            background_color=self.config.background_color, rng=rng,
        )
        return {"rgb_loss": mse_loss(gt, pred)}
