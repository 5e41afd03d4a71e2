"""NeuS: neural implicit surfaces by volume rendering.

Behavioral spec: reference `nerfstudio/models/neus.py:30-115` (NeuSSampler
iterative SDF-guided upsampling + alpha compositing) and the NeuSSampler at
`nerfstudio/model_components/ray_samplers.py:621-787`.

TPU notes: the upsample loop has a static trip count
(`num_up_sample_steps`), so the whole hierarchy traces into one program.
The reference merges each round's new samples into the old ones with a sort
+ gather of cached sdf values; the gather lowers badly on TPU, so after the
(sortless shapes kept static) merge the sdf is re-evaluated on the merged
set under stop_gradient — the same values the reference's gather would
produce, traded for extra MXU flops (which are cheap here).
"""

from dataclasses import dataclass
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp

from nerfstudio_thermal_tpu.cameras.rays import (
    RayBundle,
    RaySamples,
    get_weights_and_transmittance_from_alphas,
)
from nerfstudio_thermal_tpu.fields.base_field import FieldHeadNames
from nerfstudio_thermal_tpu.model_components.ray_samplers import (
    pdf_sample,
    spaced_sample,
)
from nerfstudio_thermal_tpu.models.base_surface_model import (
    SurfaceModel,
    SurfaceModelConfig,
)


@dataclass
class NeuSModelConfig(SurfaceModelConfig):
    """(reference neus.py:30-46)."""

    num_samples: int = 64
    num_samples_importance: int = 64
    num_up_sample_steps: int = 4
    base_variance: float = 64.0
    perturb: bool = True
    anneal_end: int = 50000
    """cos anneal schedule length (reference neus.py:86-96)."""


def rendering_sdf_with_fixed_inv_s(
    ray_samples: RaySamples, sdf: jax.Array, inv_s: float
) -> jax.Array:
    """NeuS alpha from sdf with a fixed variance
    (reference ray_samplers.py:703-751). sdf [R, S]; returns alpha [R, S-1]."""
    prev_sdf, next_sdf = sdf[:, :-1], sdf[:, 1:]
    deltas = ray_samples.deltas[:, :-1, 0]
    mid_sdf = (prev_sdf + next_sdf) * 0.5
    cos_val = (next_sdf - prev_sdf) / (deltas + 1e-5)
    prev_cos = jnp.concatenate([jnp.zeros_like(cos_val[:, :1]), cos_val[:, :-1]], -1)
    cos_val = jnp.clip(jnp.minimum(prev_cos, cos_val), -1e3, 0.0)
    prev_esti = mid_sdf - cos_val * deltas * 0.5
    next_esti = mid_sdf + cos_val * deltas * 0.5
    prev_cdf = jax.nn.sigmoid(prev_esti * inv_s)
    next_cdf = jax.nn.sigmoid(next_esti * inv_s)
    return (prev_cdf - next_cdf + 1e-5) / (prev_cdf + 1e-5)


def merge_ray_samples(
    ray_bundle: RayBundle, s1: RaySamples, s2: RaySamples
) -> RaySamples:
    """Sorted union of two sample sets in spacing domain
    (reference ray_samplers.py:753-787)."""
    starts1 = s1.spacing_starts[..., 0]
    starts2 = s2.spacing_starts[..., 0]
    ends = jnp.maximum(s1.spacing_ends[..., -1:, 0], s2.spacing_ends[..., -1:, 0])
    bins = jnp.sort(jnp.concatenate([starts1, starts2], -1), -1)
    bins = jax.lax.stop_gradient(jnp.concatenate([bins, ends], axis=-1))
    euclidean_bins = s1.spacing_to_euclidean(bins)
    return ray_bundle.get_ray_samples(
        bin_starts=euclidean_bins[..., :-1, None],
        bin_ends=euclidean_bins[..., 1:, None],
        spacing_starts=bins[..., :-1, None],
        spacing_ends=bins[..., 1:, None],
        spacing_kind=s1.spacing_kind,
        s_near=s1.s_near,
        s_far=s1.s_far,
    )


def neus_sample(
    ray_bundle: RayBundle,
    sdf_fn,
    num_samples: int = 64,
    num_samples_importance: int = 64,
    num_up_sample_steps: int = 4,
    base_variance: float = 64.0,
    single_jitter: bool = True,
    train: bool = True,
    rng: Optional[jax.Array] = None,
) -> RaySamples:
    """SDF-guided iterative upsampling (reference ray_samplers.py:650-701)."""
    rngs = (
        list(jax.random.split(rng, num_up_sample_steps + 1))
        if rng is not None
        else [None] * (num_up_sample_steps + 1)
    )
    ray_samples = spaced_sample(
        ray_bundle, num_samples, spacing_kind="uniform",
        train_stratified=True, single_jitter=single_jitter, train=train,
        rng=rngs[0],
    )
    for it in range(num_up_sample_steps):
        sdf = jax.lax.stop_gradient(sdf_fn(ray_samples))[..., 0]  # [R, S]
        alphas = rendering_sdf_with_fixed_inv_s(
            ray_samples, sdf, base_variance * 2**it
        )
        weights, _ = get_weights_and_transmittance_from_alphas(alphas[..., None])
        weights = jnp.concatenate([weights, jnp.zeros_like(weights[:, :1])], axis=1)
        new_samples = pdf_sample(
            ray_bundle, ray_samples, weights,
            num_samples_importance // num_up_sample_steps,
            include_original=False, histogram_padding=1e-5,
            single_jitter=single_jitter, train=train, rng=rngs[it + 1],
        )
        ray_samples = merge_ray_samples(ray_bundle, ray_samples, new_samples)
    return ray_samples


class NeuSModel(SurfaceModel):
    """(reference neus.py:49-115)."""

    config: NeuSModelConfig

    # The reference drives cos anneal with a BEFORE_TRAIN_ITERATION callback
    # (neus.py:86-96); here the step rides in the model's extra state and the
    # traced ratio is handed to forward each step.
    def init_extra_state(self):
        return jnp.asarray(0, jnp.int32)

    def update_extra_state(self, params, extra, step, rng):
        return step

    def extra_forward_kwargs(self, extra) -> Dict[str, Any]:
        if extra is None:
            return {}
        return {
            "cos_anneal_ratio": jnp.minimum(
                1.0, extra / max(self.config.anneal_end, 1)
            )
        }

    def sample_and_forward_field(
        self, params, ray_bundle: RayBundle, *, train, rng, cos_anneal_ratio,
        **_,
    ) -> Dict[str, Any]:
        def sdf_fn(samples):
            return self.field.apply(
                {"params": params["fields"]}, samples, method=self.field.get_sdf
            )

        ray_samples = neus_sample(
            ray_bundle, sdf_fn,
            num_samples=self.config.num_samples,
            num_samples_importance=self.config.num_samples_importance,
            num_up_sample_steps=self.config.num_up_sample_steps,
            base_variance=self.config.base_variance,
            train=train, rng=rng,
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
        }
