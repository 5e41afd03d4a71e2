"""Depth-nerfacto: nerfacto with depth supervision.

Behavioral spec: reference `nerfstudio/models/depth_nerfacto.py:36-157` —
adds a depth loss (DS-NeRF or URF) on the expected depth against dataset
termination depths; sigma optionally decays exponentially per step (a traced
scalar here instead of a callback).
"""

from dataclasses import dataclass
from typing import Optional

import jax
import jax.numpy as jnp

from nerfstudio_thermal_tpu.model_components.losses import depth_loss
from nerfstudio_thermal_tpu.models.nerfacto import NerfactoModel, NerfactoModelConfig


@dataclass
class DepthNerfactoModelConfig(NerfactoModelConfig):
    """(reference depth_nerfacto.py:36-53)."""

    depth_loss_mult: float = 1e-3
    is_euclidean_depth: bool = False
    depth_sigma: float = 0.01
    should_decay_sigma: bool = False
    starting_depth_sigma: float = 0.2
    sigma_decay_rate: float = 0.99985
    depth_loss_type: str = "ds_nerf"  # ds_nerf | urf


class DepthNerfactoModel(NerfactoModel):
    config: DepthNerfactoModelConfig

    def _sigma(self, step):
        cfg = self.config
        if not cfg.should_decay_sigma:
            return jnp.asarray(cfg.depth_sigma)
        decayed = cfg.starting_depth_sigma * cfg.sigma_decay_rate ** jnp.asarray(
            step, jnp.float32
        )
        return jnp.maximum(decayed, cfg.depth_sigma)

    def get_outputs(self, params, ray_bundle, *, train=True, rng=None, **kwargs):
        outputs = super().get_outputs(
            params, ray_bundle, train=train, rng=rng, **kwargs
        )
        outputs["directions_norm"] = ray_bundle.metadata.get(
            "directions_norm", jnp.ones_like(outputs["expected_depth"])
        )
        if train:
            outputs["ray_samples_final"] = outputs["ray_samples_list"][-1]
        return outputs

    def get_loss_dict(self, params, outputs, batch, metrics_dict, *, train=True, rng=None):
        loss_dict = super().get_loss_dict(
            params, outputs, batch, metrics_dict, train=train, rng=rng
        )
        if train and "depth_image" in batch:
            sigma = self._sigma(batch.get("step", 0))
            loss_dict["depth_loss"] = self.config.depth_loss_mult * depth_loss(
                weights=outputs["weights_list"][-1],
                ray_samples=outputs["ray_samples_final"],
                termination_depth=batch["depth_image"],
                predicted_depth=outputs["expected_depth"],
                sigma=sigma,
                directions_norm=outputs["directions_norm"],
                is_euclidean=self.config.is_euclidean_depth,
                depth_loss_type=self.config.depth_loss_type,
            )
        return loss_dict

    def get_metrics_dict(self, params, outputs, batch, train=True):
        metrics = super().get_metrics_dict(params, outputs, batch, train=train)
        if "depth_image" in batch:
            mask = batch["depth_image"] > 0
            err = jnp.abs(outputs["expected_depth"] - batch["depth_image"])
            metrics["depth_mae"] = jnp.sum(err * mask) / jnp.maximum(mask.sum(), 1)
        return metrics
