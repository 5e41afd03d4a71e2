"""Base surface model: SDF field + background field + surface rendering.

Behavioral spec: reference `nerfstudio/models/base_surface_model.py:47-405` —
SDF field, AABB collider, MLP background model sampled in linear disparity
from far to far_plane_bg (:218-246), alpha-composited foreground merged with
`rgb + bg_transmittance * rgb_bg` (:238), L1 rgb loss, eikonal loss (:283),
foreground-mask BCE loss (:286-291).

TPU notes: the eikonal term differentiates through the analytic sdf spatial
gradient (second-order autodiff under jit); all losses are static-shape.
"""

from dataclasses import dataclass, field as dataclass_field
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp

from nerfstudio_thermal_tpu.cameras.camera_optimizers import (
    CameraOptimizerConfig,
)
from nerfstudio_thermal_tpu.cameras.rays import (
    RayBundle,
    get_weights_and_transmittance_from_alphas,
)
from nerfstudio_thermal_tpu.fields.base_field import FieldHeadNames
from nerfstudio_thermal_tpu.fields.sdf_field import SDFField
from nerfstudio_thermal_tpu.fields.vanilla_nerf_field import NeRFField
from nerfstudio_thermal_tpu.model_components import renderers
from nerfstudio_thermal_tpu.model_components.losses import l1_loss
from nerfstudio_thermal_tpu.model_components.ray_samplers import spaced_sample
from nerfstudio_thermal_tpu.model_components.scene_colliders import (
    AABBBoxCollider,
    NearFarCollider,
)
from nerfstudio_thermal_tpu.models.base_model import Model, ModelConfig
from nerfstudio_thermal_tpu.utils.math import psnr


@dataclass
class SurfaceModelConfig(ModelConfig):
    """(reference base_surface_model.py:47-78)."""

    near_plane: float = 0.05
    far_plane: float = 4.0
    far_plane_bg: float = 1000.0
    background_color: str = "black"
    use_average_appearance_embedding: bool = False
    eikonal_loss_mult: float = 0.1
    fg_mask_loss_mult: float = 0.01
    mono_normal_loss_mult: float = 0.0
    mono_depth_loss_mult: float = 0.0
    background_model: str = "mlp"  # mlp | none
    num_samples_outside: int = 32
    overwrite_near_far_plane: bool = False
    compute_dtype: str = "float32"
    # sdf field knobs (reference SDFFieldConfig, fields/sdf_field.py:62-108)
    sdf_num_layers: int = 8
    sdf_hidden_dim: int = 256
    sdf_geo_feat_dim: int = 256
    sdf_num_layers_color: int = 4
    sdf_hidden_dim_color: int = 256
    sdf_bias: float = 0.8
    sdf_beta_init: float = 0.1
    sdf_use_grid_feature: bool = False
    sdf_inside_outside: bool = True
    use_appearance_embedding: bool = False
    appearance_embed_dim: int = 32
    camera_optimizer: CameraOptimizerConfig = dataclass_field(
        default_factory=lambda: CameraOptimizerConfig(mode="off")
    )


class SurfaceModel(Model):
    """Functional surface model base (subclasses implement
    sample_and_forward_field)."""

    config: SurfaceModelConfig

    def populate_modules(self):
        cfg = self.config
        self.field = SDFField(
            aabb=tuple(map(tuple, self.scene_aabb.tolist())),
            num_images=self.num_train_data,
            num_layers=cfg.sdf_num_layers,
            hidden_dim=cfg.sdf_hidden_dim,
            geo_feat_dim=cfg.sdf_geo_feat_dim,
            num_layers_color=cfg.sdf_num_layers_color,
            hidden_dim_color=cfg.sdf_hidden_dim_color,
            bias=cfg.sdf_bias,
            beta_init=cfg.sdf_beta_init,
            use_grid_feature=cfg.sdf_use_grid_feature,
            inside_outside=cfg.sdf_inside_outside,
            use_appearance_embedding=cfg.use_appearance_embedding,
            use_average_appearance_embedding=cfg.use_average_appearance_embedding,
            appearance_embedding_dim=cfg.appearance_embed_dim,
        )
        if cfg.overwrite_near_far_plane:
            self.collider = NearFarCollider(cfg.near_plane, cfg.far_plane)
        else:
            self.collider = AABBBoxCollider(self.scene_aabb, near_plane=0.05)
        if cfg.background_model == "mlp":
            self.field_background = NeRFField(
                position_num_frequencies=10, direction_num_frequencies=4,
            )
        else:
            self.field_background = None

    # ------------------------------------------------------------------

    def init_params(self, rng: jax.Array) -> Dict[str, Any]:
        from nerfstudio_thermal_tpu.models.nerfacto import _dummy_ray_samples

        k_field, k_bg = jax.random.split(rng)
        dummy = _dummy_ray_samples()
        params: Dict[str, Any] = {
            "fields": self.field.init(k_field, dummy, train=True)["params"]
        }
        if self.field_background is not None:
            params["field_background"] = self.field_background.init(
                k_bg, dummy, train=True
            )["params"]
        return params

    def sample_and_forward_field(
        self, params, ray_bundle: RayBundle, *, train, rng, cos_anneal_ratio
    ) -> Dict[str, Any]:
        raise NotImplementedError

    def sdf_fn(self, params, positions: jax.Array) -> jax.Array:
        """World positions [..., 3] -> sdf [...] (marching-cubes export)."""
        return self.field.apply(
            {"params": params["fields"]}, positions,
            method=self.field.get_sdf_at,
        )[..., 0]

    def get_outputs(
        self,
        params,
        ray_bundle: RayBundle,
        *,
        train: bool = True,
        rng: Optional[jax.Array] = None,
        cos_anneal_ratio: jax.Array | float = 1.0,
        **kwargs,
    ):
        """(reference base_surface_model.py:186-276)."""
        cfg = self.config
        s = self.sample_and_forward_field(
            params, ray_bundle, train=train, rng=rng,
            cos_anneal_ratio=cos_anneal_ratio, **kwargs,
        )
        field_outputs = s["field_outputs"]
        ray_samples = s["ray_samples"]
        weights = s["weights"]
        bg_transmittance = s["bg_transmittance"]

        rgb = renderers.render_rgb(
            field_outputs[FieldHeadNames.RGB], weights,
            background_color="black", train=train,
        )
        depth = renderers.render_depth_expected(weights, ray_samples)
        normal = renderers.render_normals(
            field_outputs[FieldHeadNames.NORMALS], weights, normalize=False
        )
        accumulation = renderers.render_accumulation(weights)

        outputs = {
            "rgb": rgb,
            "accumulation": accumulation,
            "depth": depth,
            "normal": normal,
            "normal_vis": (normal + 1.0) / 2.0,
        }

        if self.field_background is not None:
            # sample linear-disparity from the surface far plane out to
            # far_plane_bg (reference :222-236)
            bg_bundle = ray_bundle.replace(
                nears=ray_bundle.fars,
                fars=jnp.ones_like(ray_bundle.fars) * cfg.far_plane_bg,
            )
            bg_samples = spaced_sample(
                bg_bundle, cfg.num_samples_outside, spacing_kind="lindisp",
                train_stratified=True, single_jitter=False, train=train, rng=rng,
            )
            bg_out = self.field_background.apply(
                {"params": params["field_background"]}, bg_samples, train=train
            )
            w_bg = bg_samples.get_weights(bg_out[FieldHeadNames.DENSITY])
            rgb_bg = renderers.render_rgb(
                bg_out[FieldHeadNames.RGB], w_bg,
                background_color=cfg.background_color, train=train,
            )
            outputs["bg_rgb"] = rgb_bg
            outputs["bg_accumulation"] = renderers.render_accumulation(w_bg)
            outputs["bg_depth"] = renderers.render_depth_expected(w_bg, bg_samples)
            outputs["rgb"] = rgb + bg_transmittance * rgb_bg

        if train:
            outputs["eik_grad"] = field_outputs[FieldHeadNames.GRADIENT]
            outputs["weights"] = weights
            if "weights_list" in s:
                outputs["weights_list"] = s["weights_list"]
                outputs["ray_samples_list"] = s["ray_samples_list"]
        else:
            if "weights_list" in s:
                for i in range(len(s["weights_list"]) - 1):
                    outputs[f"prop_depth_{i}"] = renderers.render_depth_median(
                        s["weights_list"][i], s["ray_samples_list"][i]
                    )
        return outputs

    # ------------------------------------------------------------------

    def get_metrics_dict(self, params, outputs, batch, train: bool = True):
        gt = renderers.blend_background_rgb(batch["image"])
        metrics = {"psnr": psnr(outputs["rgb"], gt)}
        if train:
            metrics["s_val"] = jnp.exp(
                params["fields"]["variance"] * 10.0
            )
        return metrics

    def get_loss_dict(self, params, outputs, batch, metrics_dict, *, train=True, rng=None):
        """(reference base_surface_model.py:277-330)."""
        cfg = self.config
        pred, gt = renderers.blend_background_for_loss_rgb(
            pred_image=outputs["rgb"],
            pred_accumulation=outputs["accumulation"],
            gt_image=batch["image"],
            background_color=cfg.background_color,
            rng=rng,
        )
        loss_dict = {"rgb_loss": l1_loss(gt, pred)}
        if train:
            grad = outputs["eik_grad"]
            loss_dict["eikonal_loss"] = (
                jnp.mean((jnp.linalg.norm(grad, axis=-1) - 1.0) ** 2)
                * cfg.eikonal_loss_mult
            )
            if "fg_mask" in batch and cfg.fg_mask_loss_mult > 0:
                fg = batch["fg_mask"].astype(jnp.float32)
                w_sum = jnp.clip(
                    jnp.sum(outputs["weights"], axis=-2)[..., 0], 1e-3, 1 - 1e-3
                )
                bce = -(fg * jnp.log(w_sum) + (1 - fg) * jnp.log(1 - w_sum))
                loss_dict["fg_mask_loss"] = jnp.mean(bce) * cfg.fg_mask_loss_mult
            # monocular priors (reference base_surface_model.py:293-330)
            if "normal" in batch and cfg.mono_normal_loss_mult > 0:
                from nerfstudio_thermal_tpu.model_components.losses import (
                    monosdf_normal_loss,
                )

                loss_dict["normal_loss"] = cfg.mono_normal_loss_mult * (
                    monosdf_normal_loss(outputs["normal"], batch["normal"])
                )
            depth_key = "depth" if "depth" in batch else (
                "depth_image" if "depth_image" in batch else None
            )
            if depth_key is not None and cfg.mono_depth_loss_mult > 0:
                from nerfstudio_thermal_tpu.model_components.losses import (
                    scale_and_shift_invariant_depth_loss,
                )

                depth_gt = (batch[depth_key].reshape(-1) * 50 + 0.5)
                depth_pred = outputs["depth"].reshape(-1)
                n = depth_pred.shape[0]
                rows = max(n // 32, 1) * 32
                loss_dict["depth_loss"] = cfg.mono_depth_loss_mult * (
                    scale_and_shift_invariant_depth_loss(
                        depth_pred[:rows].reshape(1, 32, -1),
                        depth_gt[:rows].reshape(1, 32, -1),
                        jnp.ones((1, 32, rows // 32), bool),
                        alpha=0.5, scales=1,
                    )
                )
        return loss_dict
