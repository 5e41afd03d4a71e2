"""MipNeRF: integrated positional encodings over conical frustums.

Behavioral spec: reference `nerfstudio/models/mipnerf.py:37-212` — ONE shared
field with use_integrated_encoding, uniform coarse sampling -> PDF fine
sampling (no original samples), MSE on both passes.
"""

from dataclasses import dataclass
from typing import Any, Dict

import jax
import jax.numpy as jnp

from nerfstudio_thermal_tpu.cameras.rays import RayBundle
from nerfstudio_thermal_tpu.fields.base_field import FieldHeadNames
from nerfstudio_thermal_tpu.fields.vanilla_nerf_field import NeRFField
from nerfstudio_thermal_tpu.model_components import renderers
from nerfstudio_thermal_tpu.model_components.losses import mse_loss
from nerfstudio_thermal_tpu.model_components.ray_samplers import (
    pdf_sample,
    spaced_sample,
)
from nerfstudio_thermal_tpu.model_components.scene_colliders import NearFarCollider
from nerfstudio_thermal_tpu.models.base_model import Model
from nerfstudio_thermal_tpu.models.vanilla_nerf import VanillaModelConfig
from nerfstudio_thermal_tpu.utils.math import psnr


@dataclass
class MipNerfModelConfig(VanillaModelConfig):
    num_coarse_samples: int = 128
    num_importance_samples: int = 128


class MipNerfModel(Model):
    config: MipNerfModelConfig

    def populate_modules(self):
        cfg = self.config
        dtype = jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else jnp.float32
        self.field = NeRFField(
            use_integrated_encoding=True,
            position_num_frequencies=16,
            direction_num_frequencies=4,
            compute_dtype=dtype,
            use_pallas=cfg.use_pallas,
        )
        self.collider = NearFarCollider(cfg.near_plane, cfg.far_plane)

    def init_params(self, rng: jax.Array) -> Dict[str, Any]:
        from nerfstudio_thermal_tpu.models.nerfacto import _dummy_ray_samples

        return {
            "fields": self.field.init(rng, _dummy_ray_samples(), train=True)["params"]
        }

    def get_outputs(self, params, ray_bundle: RayBundle, *, train=True, rng=None, **_):
        cfg = self.config
        rng_u, rng_pdf = jax.random.split(rng) if rng is not None else (None, None)
        field_params = {"params": params["fields"]}

        samples_u = spaced_sample(
            ray_bundle, cfg.num_coarse_samples, spacing_kind="uniform",
            train=train, rng=rng_u,
        )
        out_c = self.field.apply(field_params, samples_u, train=train)
        w_c = samples_u.get_weights(out_c[FieldHeadNames.DENSITY])
        rgb_coarse = renderers.render_rgb(
            out_c[FieldHeadNames.RGB], w_c, cfg.background_color, train=train
        )

        samples_pdf = pdf_sample(
            ray_bundle, samples_u, w_c, cfg.num_importance_samples,
            include_original=False, train=train, rng=rng_pdf,
        )
        out_f = self.field.apply(field_params, samples_pdf, train=train)
        w_f = samples_pdf.get_weights(out_f[FieldHeadNames.DENSITY])
        rgb_fine = renderers.render_rgb(
            out_f[FieldHeadNames.RGB], w_f, cfg.background_color, train=train
        )

        return {
            "rgb_coarse": rgb_coarse,
            "rgb_fine": rgb_fine,
            "rgb": rgb_fine,
            "accumulation": renderers.render_accumulation(w_f),
            "accumulation_coarse": renderers.render_accumulation(w_c),
            "depth": renderers.render_depth_median(w_f, samples_pdf),
            "depth_coarse": renderers.render_depth_median(w_c, samples_u),
            "expected_depth": renderers.render_depth_expected(w_f, samples_pdf),
        }

    def get_metrics_dict(self, params, outputs, batch, train=True):
        gt = renderers.blend_background_rgb(batch["image"])
        return {
            "psnr": psnr(outputs["rgb_fine"], gt),
            "psnr_coarse": psnr(outputs["rgb_coarse"], gt),
        }

    def get_loss_dict(self, params, outputs, batch, metrics_dict, *, train=True, rng=None):
        gt = renderers.blend_background_rgb(batch["image"])
        return {
            "rgb_loss_coarse": mse_loss(outputs["rgb_coarse"], gt),
            "rgb_loss_fine": mse_loss(outputs["rgb_fine"], gt),
        }
