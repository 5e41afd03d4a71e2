"""Semantic NeRF-W: nerfacto + per-sample semantic logits rendered with
detached weights and trained with cross-entropy.

Behavioral spec: reference `nerfstudio/models/semantic_nerfw.py:51-311` —
semantic head over geo features (weights detached unless
pass_semantic_gradients), semantics_colormap output, CE loss (:258-261).
The reference's transient-embedding branch raises "not fully working"
(:81-82) and is likewise not implemented here.
"""

from dataclasses import dataclass
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from nerfstudio_thermal_tpu.cameras.rays import RayBundle
from nerfstudio_thermal_tpu.fields.base_field import FieldHeadNames
from nerfstudio_thermal_tpu.model_components import renderers
from nerfstudio_thermal_tpu.models.nerfacto import NerfactoModel, NerfactoModelConfig


@dataclass
class SemanticNerfWModelConfig(NerfactoModelConfig):
    """(reference semantic_nerfw.py:51-58)."""

    semantic_loss_weight: float = 1.0
    pass_semantic_gradients: bool = False


class SemanticNerfWModel(NerfactoModel):
    config: SemanticNerfWModelConfig

    def populate_modules(self):
        sem = self.metadata.get("semantics") or {}
        self.semantic_classes = list(sem.get("classes", []))
        colors = sem.get("colors")
        if colors is None:
            rng = np.random.default_rng(0)
            colors = rng.uniform(size=(max(len(self.semantic_classes), 1), 3))
        self.semantic_colormap = np.asarray(colors, np.float32)
        self.num_semantic_classes = max(len(self.semantic_classes), 1)
        super().populate_modules()
        # rebuild the field with the semantic head enabled
        self.field = self.field.clone(
            num_semantic_classes=self.num_semantic_classes,
            pass_semantic_gradients=self.config.pass_semantic_gradients,
        )

    def _get_outputs_for_field(
        self, params, field_name, field, renderer_channels, ray_samples,
        weights_list, ray_samples_list, *, train,
    ):
        """One field apply; adds the semantic render to the nerfacto outputs
        (reference semantic_nerfw.py:176-226)."""
        from nerfstudio_thermal_tpu.model_components.losses import (
            scale_gradients_by_distance_squared,
        )

        cfg = self.config
        field_outputs = field.apply(
            {"params": params[field_name]}, ray_samples, train=train
        )
        if cfg.use_gradient_scaling:
            field_outputs = scale_gradients_by_distance_squared(
                field_outputs, ray_samples
            )
        weights = ray_samples.get_weights(field_outputs[FieldHeadNames.DENSITY])
        weights_list = weights_list + [weights]
        ray_samples_list = ray_samples_list + [ray_samples]

        rgb = renderers.render_rgb(
            field_outputs[FieldHeadNames.RGB], weights,
            background_color=cfg.background_color, train=train,
        )
        outputs = {
            "rgb": rgb,
            "accumulation": renderers.render_accumulation(weights),
            "depth": jax.lax.stop_gradient(
                renderers.render_depth_median(weights, ray_samples)
            ),
            "expected_depth": renderers.render_depth_expected(weights, ray_samples),
            "density": field_outputs[FieldHeadNames.DENSITY],
        }
        # semantics composited with DETACHED weights (reference :215-220)
        w = jax.lax.stop_gradient(weights)
        sem = jnp.sum(w * field_outputs[FieldHeadNames.SEMANTICS], axis=-2)
        outputs["semantics"] = sem
        labels = jnp.argmax(jax.nn.softmax(sem, axis=-1), axis=-1)
        outputs["semantics_colormap"] = jnp.asarray(self.semantic_colormap)[labels]
        if not train:
            for i in range(cfg.num_proposal_iterations):
                outputs[f"prop_depth_{i}"] = renderers.render_depth_median(
                    weights_list[i], ray_samples_list[i]
                )
        return outputs, weights_list, ray_samples_list

    def get_loss_dict(self, params, outputs, batch, metrics_dict, *, train=True, rng=None):
        loss_dict = super().get_loss_dict(
            params, outputs, batch, metrics_dict, train=train, rng=rng
        )
        if train and "semantics" in batch and "semantics" in outputs:
            logits = outputs["semantics"]
            labels = batch["semantics"].astype(jnp.int32).reshape(-1)
            logp = jax.nn.log_softmax(logits, axis=-1)
            onehot = jax.nn.one_hot(labels, logits.shape[-1])
            ce = -jnp.sum(onehot * logp, axis=-1)
            loss_dict["semantics_loss"] = (
                self.config.semantic_loss_weight * jnp.mean(ce)
            )
        return loss_dict
