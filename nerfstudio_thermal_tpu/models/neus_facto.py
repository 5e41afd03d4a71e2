"""NeuS-facto: NeuS surface rendering with nerfacto's proposal sampling.

Behavioral spec: reference `nerfstudio/models/neus_facto.py:40-219` —
proposal hierarchy (always-updated schedule, :116-117), NeuS alpha
compositing on the final samples, interlevel loss (:200-207), cos anneal
over 50k steps inherited from NeuSModel (:86-96).
"""

from dataclasses import dataclass, field as dataclass_field
from typing import Any, Dict, List, Tuple

import jax
import jax.numpy as jnp

from nerfstudio_thermal_tpu.cameras.rays import (
    RayBundle,
    get_weights_and_transmittance_from_alphas,
)
from nerfstudio_thermal_tpu.fields.base_field import FieldHeadNames
from nerfstudio_thermal_tpu.fields.density_fields import HashMLPDensityField
from nerfstudio_thermal_tpu.model_components.losses import interlevel_loss
from nerfstudio_thermal_tpu.model_components.ray_samplers import proposal_sample
from nerfstudio_thermal_tpu.models.nerfacto import _dummy_ray_samples
from nerfstudio_thermal_tpu.models.neus import NeuSModel, NeuSModelConfig


@dataclass
class NeuSFactoModelConfig(NeuSModelConfig):
    """(reference neus_facto.py:40-73)."""

    num_proposal_samples_per_ray: Tuple[int, ...] = (256, 96)
    num_neus_samples_per_ray: int = 48
    num_proposal_iterations: int = 2
    use_same_proposal_network: bool = False
    proposal_net_args_list: List[Dict] = dataclass_field(
        default_factory=lambda: [
            {"hidden_dim": 16, "log2_hashmap_size": 17, "num_levels": 5, "max_res": 64},
            {"hidden_dim": 16, "log2_hashmap_size": 17, "num_levels": 5, "max_res": 256},
        ]
    )
    interlevel_loss_mult: float = 1.0
    use_proposal_weight_anneal: bool = True
    proposal_weights_anneal_slope: float = 10.0
    proposal_weights_anneal_max_num_iters: int = 1000
    use_single_jitter: bool = True


class NeuSFactoModel(NeuSModel):
    """(reference neus_facto.py:75-219)."""

    config: NeuSFactoModelConfig

    def populate_modules(self):
        super().populate_modules()
        cfg = self.config
        self.proposal_networks = []
        num_prop = cfg.num_proposal_iterations
        args_list = cfg.proposal_net_args_list
        n_unique = 1 if cfg.use_same_proposal_network else num_prop
        for i in range(n_unique):
            args = dict(args_list[min(i, len(args_list) - 1)])
            args.pop("use_linear", None)
            self.proposal_networks.append(
                HashMLPDensityField(
                    aabb=tuple(map(tuple, self.scene_aabb.tolist())),
                    use_spatial_distortion=True,
                    **args,
                )
            )

    def init_params(self, rng: jax.Array) -> Dict[str, Any]:
        k1, k2 = jax.random.split(rng)
        params = super().init_params(k1)
        prop_keys = jax.random.split(k2, len(self.proposal_networks))
        params["proposal_networks"] = {
            str(i): net.init(k, ray_samples=_dummy_ray_samples())["params"]
            for i, (net, k) in enumerate(zip(self.proposal_networks, prop_keys))
        }
        return params

    def _density_fns(self, params):
        fns = []
        n_unique = len(self.proposal_networks)
        for i in range(self.config.num_proposal_iterations):
            j = min(i, n_unique - 1)
            net = self.proposal_networks[j]
            p = params["proposal_networks"][str(j)]
            fns.append(
                lambda samples, net=net, p=p: net.apply(
                    {"params": p}, ray_samples=samples
                )
            )
        return fns

    def sample_and_forward_field(
        self, params, ray_bundle: RayBundle, *, train, rng, cos_anneal_ratio,
        anneal=1.0, **_,
    ) -> Dict[str, Any]:
        cfg = self.config
        ray_samples, weights_list, ray_samples_list = proposal_sample(
            ray_bundle,
            self._density_fns(params),
            num_proposal_samples_per_ray=cfg.num_proposal_samples_per_ray,
            num_nerf_samples_per_ray=cfg.num_neus_samples_per_ray,
            initial_spacing_kind="uniform",
            single_jitter=cfg.use_single_jitter,
            anneal=anneal,
            updated=True,  # reference update_sched always updates (:116-117)
            train=train,
            rng=rng,
        )
        field_outputs = self.field.apply(
            {"params": params["fields"]}, ray_samples, train=train,
            return_alphas=True, cos_anneal_ratio=cos_anneal_ratio,
        )
        weights, transmittance = get_weights_and_transmittance_from_alphas(
            field_outputs[FieldHeadNames.ALPHA]
        )
        return {
            "ray_samples": ray_samples,
            "field_outputs": field_outputs,
            "weights": weights,
            "bg_transmittance": transmittance[:, -1, :],
            "weights_list": weights_list + [weights],
            "ray_samples_list": ray_samples_list + [ray_samples],
        }

    def get_outputs(self, params, ray_bundle, *, train=True, rng=None,
                    anneal=1.0, updated=True, cos_anneal_ratio=1.0, **kwargs):
        # `updated` is accepted for trainer-signature parity but the
        # reference's neus-facto always propagates proposal grads (:116-117)
        return super().get_outputs(
            params, ray_bundle, train=train, rng=rng,
            cos_anneal_ratio=cos_anneal_ratio, anneal=anneal, **kwargs,
        )

    def get_loss_dict(self, params, outputs, batch, metrics_dict, *, train=True, rng=None):
        loss_dict = super().get_loss_dict(
            params, outputs, batch, metrics_dict, train=train, rng=rng
        )
        if train:
            loss_dict["interlevel_loss"] = (
                self.config.interlevel_loss_mult
                * interlevel_loss(outputs["weights_list"], outputs["ray_samples_list"])
            )
        return loss_dict
