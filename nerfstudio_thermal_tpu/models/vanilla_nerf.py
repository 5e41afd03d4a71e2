"""Vanilla NeRF: coarse/fine frequency-encoded fields.

Behavioral spec: reference `nerfstudio/models/vanilla_nerf.py:41-264` —
uniform coarse sampling (64) -> PDF fine sampling (128, includes original),
separate coarse/fine fields, white background, MSE on both heads.
"""

from dataclasses import dataclass, field as dataclass_field
from typing import Any, Dict, Optional

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
from nerfstudio_thermal_tpu.models.base_model import Model, ModelConfig
from nerfstudio_thermal_tpu.utils.math import psnr


@dataclass
class VanillaModelConfig(ModelConfig):
    num_coarse_samples: int = 64
    num_importance_samples: int = 128
    background_color: str = "white"
    near_plane: float = 2.0
    far_plane: float = 6.0
    compute_dtype: str = "float32"
    use_pallas: bool = False


class NeRFModel(Model):
    config: VanillaModelConfig

    def populate_modules(self):
        cfg = self.config
        dtype = jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else jnp.float32
        self.field_coarse = NeRFField(compute_dtype=dtype, use_pallas=cfg.use_pallas)
        self.field_fine = NeRFField(compute_dtype=dtype, use_pallas=cfg.use_pallas)
        self.collider = NearFarCollider(cfg.near_plane, cfg.far_plane)

    def init_params(self, rng: jax.Array) -> Dict[str, Any]:
        from nerfstudio_thermal_tpu.models.nerfacto import _dummy_ray_samples

        k1, k2 = jax.random.split(rng)
        dummy = _dummy_ray_samples()
        return {
            "fields": {
                "coarse": self.field_coarse.init(k1, dummy, train=True)["params"],
                "fine": self.field_fine.init(k2, dummy, train=True)["params"],
            }
        }

    def get_outputs(self, params, ray_bundle: RayBundle, *, train=True, rng=None, **_):
        cfg = self.config
        rng_u, rng_pdf = (
            jax.random.split(rng) if rng is not None else (None, None)
        )
        # coarse
        samples_u = spaced_sample(
            ray_bundle, cfg.num_coarse_samples, spacing_kind="uniform",
            train=train, rng=rng_u,
        )
        out_c = self.field_coarse.apply(
            {"params": params["fields"]["coarse"]}, samples_u, train=train
        )
        w_c = samples_u.get_weights(out_c[FieldHeadNames.DENSITY])
        rgb_coarse = renderers.render_rgb(
            out_c[FieldHeadNames.RGB], w_c, cfg.background_color, train=train
        )
        acc_c = renderers.render_accumulation(w_c)
        depth_c = renderers.render_depth_median(w_c, samples_u)

        # fine
        samples_pdf = pdf_sample(
            ray_bundle, samples_u, w_c, cfg.num_importance_samples,
            include_original=True, train=train, rng=rng_pdf,
        )
        out_f = self.field_fine.apply(
            {"params": params["fields"]["fine"]}, samples_pdf, train=train
        )
        w_f = samples_pdf.get_weights(out_f[FieldHeadNames.DENSITY])
        rgb_fine = renderers.render_rgb(
            out_f[FieldHeadNames.RGB], w_f, cfg.background_color, train=train
        )
        acc_f = renderers.render_accumulation(w_f)
        depth_f = renderers.render_depth_median(w_f, samples_pdf)

        return {
            "rgb_coarse": rgb_coarse,
            "rgb_fine": rgb_fine,
            "rgb": rgb_fine,
            "accumulation_coarse": acc_c,
            "accumulation_fine": acc_f,
            "accumulation": acc_f,
            "depth_coarse": depth_c,
            "depth_fine": depth_f,
            "depth": depth_f,
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
