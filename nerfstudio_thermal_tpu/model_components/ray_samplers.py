"""Ray sampling strategies as pure functions.

Behavioral spec: reference `nerfstudio/model_components/ray_samplers.py`
(`SpacedSampler:53-128`, `UniformLinDispPiecewiseSampler:225`,
`PDFSampler:251-372`, `ProposalNetworkSampler:523-619`).

TPU design notes:
- All samplers are pure functions of (rng, rays) with static sample counts, so
  the whole proposal hierarchy traces into one XLA program.
- The reference's "updated" flag (gradient to proposal nets only on scheduled
  steps, ray_samplers.py:592-611) is a traced boolean here, implemented with
  `stop_gradient` switching instead of Python control flow, so one compiled
  program serves every step.
- Inverse-CDF sampling uses a batched searchsorted.
"""

import os
from typing import Callable, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from nerfstudio_thermal_tpu.cameras.rays import (
    RayBundle,
    RaySamples,
    spacing_fn,
)


def searchsorted_batched(a: jax.Array, v: jax.Array, side: str = "right") -> jax.Array:
    """searchsorted over the last axis with matching batch dims.

    a: [..., M] sorted, v: [..., K] -> int32 [..., K].

    TPU note: implemented as a comparison count — insertion index is simply
    #\\{a <= v\\} (side=right) or #\\{a < v\\}. The [..., M, K] boolean intermediate
    is small at ray-sampling sizes (M, K <= ~500) and runs at VPU speed; both
    a vmapped binary search (serial scan lowering) and a sort-based merge
    compile and run orders of magnitude slower on TPU.
    """
    if side == "right":
        cmp = a[..., :, None] <= v[..., None, :]
    else:
        cmp = a[..., :, None] < v[..., None, :]
    return jnp.sum(cmp, axis=-2, dtype=jnp.int32)


def take_below_above(
    a: jax.Array,  # [..., M] sorted ascending
    v: jax.Array,  # [..., K] queries
    values: jax.Array,  # [..., M] monotone non-decreasing, aligned with a
    side: str = "right",
):
    """values[clip(searchsorted(a, v, side) - 1)] and values[clip(searchsorted)]
    without any gather.

    TPU note: take_along_axis lowers to a ~serial row-gather (measured
    ~55 M elem/s — it dominated the train step). Because every gathered array
    at our call sites (CDFs, bin edges, cumulative histograms, depth steps)
    is monotone and index-aligned with the sorted search array, the gather is
    equivalent to a masked max (below) / masked min (above) reduction, which
    XLA fuses into a single VPU pass over [..., M, K] with nothing
    materialized. Empty masks resolve to the first/last element, matching the
    reference's index clipping (ray_samplers.py:338-345, losses.py:78-84).
    """
    if side == "right":
        mask = a[..., :, None] <= v[..., None, :]
    else:
        mask = a[..., :, None] < v[..., None, :]
    vexp = values[..., :, None]
    below = jnp.max(jnp.where(mask, vexp, -jnp.inf), axis=-2)
    above = jnp.min(jnp.where(mask, jnp.inf, vexp), axis=-2)
    below = jnp.where(jnp.isinf(below), values[..., :1], below)
    above = jnp.where(jnp.isinf(above), values[..., -1:], above)
    return below, above


def _inverse_cdf_lookup(cdf: jax.Array, u: jax.Array, existing_bins: jax.Array):
    """The four inverse-CDF lookups of pdf_sample: (cdf_below, cdf_above,
    bins_below, bins_above) at each query u.

    Two trace-time-selected implementations (sweepable on a live TPU via env,
    no code edits):

    - "masked" (default): two `take_below_above` passes — 1 shared [R, M, K]
      comparison + 4 masked min/max VPU reductions.
    - "onehot" (NS_RESAMPLE_ONEHOT=1): one comparison-count searchsorted
      (a single [R, M, K] pass + reduce), then ALL FOUR gathers as one
      batched one-hot matmul [R, K, M] @ [R, M, 4] that rides the MXU
      (matmuls are effectively free at these sizes on v5e, while each extra
      VPU pass over [R, M, K] is not). Exact — every output row selects a
      single element. Relies on cdf[..., 0] == 0 <= u so the insertion index
      is always >= 1 (pdf_sample constructs cdf that way).

    NS_PROP_BF16=1 additionally runs the [R, M, K] comparison in bfloat16
    (halves the dominant VPU pass's operand width; the gathered VALUES stay
    f32 in onehot mode — only the below/above split quantizes).
    """
    bf16 = os.environ.get("NS_PROP_BF16", "0") == "1"
    if os.environ.get("NS_RESAMPLE_ONEHOT", "0") == "1":
        m = cdf.shape[-1]
        a, v = (cdf.astype(jnp.bfloat16), u.astype(jnp.bfloat16)) if bf16 else (cdf, u)
        # insertion index (side="right"); >= 1 because cdf[..., 0] == 0 <= u
        idx_below = searchsorted_batched(a, v, side="right") - 1  # [R, K]
        onehot = (
            jnp.arange(m, dtype=jnp.int32) == idx_below[..., None]
        )  # [R, K, M]
        shift_last = lambda x: jnp.concatenate(  # noqa: E731
            [x[..., 1:], x[..., -1:]], axis=-1
        )
        stacked = jnp.stack(
            [cdf, shift_last(cdf), existing_bins, shift_last(existing_bins)],
            axis=-1,
        )  # [R, M, 4]
        gathered = jnp.einsum(
            "...km,...mf->...kf",
            onehot.astype(jnp.float32),
            stacked,
            precision=jax.lax.Precision.HIGHEST,
        )
        return (
            gathered[..., 0],
            gathered[..., 1],
            gathered[..., 2],
            gathered[..., 3],
        )
    if bf16:
        cdf_lu, u_lu = cdf.astype(jnp.bfloat16), u.astype(jnp.bfloat16)
        cdf_g0, cdf_g1 = take_below_above(cdf_lu, u_lu, cdf.astype(jnp.bfloat16))
        bins_g0, bins_g1 = take_below_above(
            cdf_lu, u_lu, existing_bins.astype(jnp.bfloat16)
        )
        return (
            cdf_g0.astype(jnp.float32),
            cdf_g1.astype(jnp.float32),
            bins_g0.astype(jnp.float32),
            bins_g1.astype(jnp.float32),
        )
    cdf_g0, cdf_g1 = take_below_above(cdf, u, cdf)
    bins_g0, bins_g1 = take_below_above(cdf, u, existing_bins)
    return cdf_g0, cdf_g1, bins_g0, bins_g1


def spaced_sample(
    ray_bundle: RayBundle,
    num_samples: int,
    spacing_kind: str = "uniform",
    train_stratified: bool = True,
    single_jitter: bool = False,
    train: bool = True,
    rng: Optional[jax.Array] = None,
) -> RaySamples:
    """Sample along rays according to a spacing warp
    (reference ray_samplers.py:78-128)."""
    num_rays = ray_bundle.origins.shape[0]
    bins = jnp.linspace(0.0, 1.0, num_samples + 1)[None, :]  # [1, S+1]
    bins = jnp.broadcast_to(bins, (num_rays, num_samples + 1))

    if train_stratified and train:
        assert rng is not None
        if single_jitter:
            t_rand = jax.random.uniform(rng, (num_rays, 1))
        else:
            t_rand = jax.random.uniform(rng, (num_rays, num_samples + 1))
        bin_centers = (bins[..., 1:] + bins[..., :-1]) / 2.0
        bin_upper = jnp.concatenate([bin_centers, bins[..., -1:]], axis=-1)
        bin_lower = jnp.concatenate([bins[..., :1], bin_centers], axis=-1)
        bins = bin_lower + (bin_upper - bin_lower) * t_rand

    s_near = spacing_fn(spacing_kind, ray_bundle.nears)  # [R, 1]
    s_far = spacing_fn(spacing_kind, ray_bundle.fars)

    def to_euclid(s):
        from nerfstudio_thermal_tpu.cameras.rays import spacing_fn_inv

        return spacing_fn_inv(spacing_kind, s * s_far + (1.0 - s) * s_near)

    euclidean_bins = to_euclid(bins)  # [R, S+1]

    return ray_bundle.get_ray_samples(
        bin_starts=euclidean_bins[..., :-1, None],
        bin_ends=euclidean_bins[..., 1:, None],
        spacing_starts=bins[..., :-1, None],
        spacing_ends=bins[..., 1:, None],
        spacing_kind=spacing_kind,
        s_near=s_near,
        s_far=s_far,
    )


def pdf_sample(
    ray_bundle: RayBundle,
    ray_samples: RaySamples,
    weights: jax.Array,  # [R, S, 1]
    num_samples: int,
    train_stratified: bool = True,
    single_jitter: bool = False,
    include_original: bool = True,
    histogram_padding: float = 0.01,
    train: bool = True,
    rng: Optional[jax.Array] = None,
    eps: float = 1e-5,
) -> RaySamples:
    """Inverse-CDF resampling in spacing domain
    (reference ray_samplers.py:276-372)."""
    num_bins = num_samples + 1
    w = weights[..., 0] + histogram_padding  # [R, S]

    weights_sum = jnp.sum(w, axis=-1, keepdims=True)
    padding = jax.nn.relu(eps - weights_sum)
    w = w + padding / w.shape[-1]
    weights_sum = weights_sum + padding

    pdf = w / weights_sum
    from nerfstudio_thermal_tpu.utils.math import cumsum_mxu

    cdf = jnp.minimum(jnp.ones_like(pdf), cumsum_mxu(pdf, axis=-1))
    cdf = jnp.concatenate([jnp.zeros_like(cdf[..., :1]), cdf], axis=-1)  # [R, S+1]

    u = jnp.linspace(0.0, 1.0 - 1.0 / num_bins, num_bins)
    u = jnp.broadcast_to(u, (*cdf.shape[:-1], num_bins))
    if train_stratified and train:
        assert rng is not None
        if single_jitter:
            rand = jax.random.uniform(rng, (*cdf.shape[:-1], 1)) / num_bins
        else:
            rand = jax.random.uniform(rng, (*cdf.shape[:-1], num_bins)) / num_bins
        u = u + rand
    else:
        u = u + 1.0 / (2 * num_bins)

    existing_bins = jnp.concatenate(
        [ray_samples.spacing_starts[..., 0], ray_samples.spacing_ends[..., -1:, 0]],
        axis=-1,
    )  # [R, S+1]

    # gather-free inverse-CDF lookups (see _inverse_cdf_lookup for the
    # trace-time masked/onehot/bf16 variants)
    cdf_g0, cdf_g1, bins_g0, bins_g1 = _inverse_cdf_lookup(cdf, u, existing_bins)

    t = jnp.clip(jnp.nan_to_num((u - cdf_g0) / (cdf_g1 - cdf_g0), nan=0.0), 0, 1)
    bins = bins_g0 + t * (bins_g1 - bins_g0)

    if include_original:
        bins = jnp.sort(jnp.concatenate([existing_bins, bins], axis=-1), axis=-1)

    bins = jax.lax.stop_gradient(bins)

    euclidean_bins = ray_samples.spacing_to_euclidean(bins)

    return ray_bundle.get_ray_samples(
        bin_starts=euclidean_bins[..., :-1, None],
        bin_ends=euclidean_bins[..., 1:, None],
        spacing_starts=bins[..., :-1, None],
        spacing_ends=bins[..., 1:, None],
        spacing_kind=ray_samples.spacing_kind,
        s_near=ray_samples.s_near,
        s_far=ray_samples.s_far,
    )


def proposal_sample(
    ray_bundle: RayBundle,
    density_fns: Sequence[Callable[[jax.Array], jax.Array]],
    num_proposal_samples_per_ray: Tuple[int, ...] = (256, 96),
    num_nerf_samples_per_ray: int = 48,
    initial_spacing_kind: str = "piecewise",
    single_jitter: bool = True,
    anneal: jax.Array | float = 1.0,
    updated: jax.Array | bool = True,
    train: bool = True,
    rng: Optional[jax.Array] = None,
) -> Tuple[RaySamples, List[jax.Array], List[RaySamples]]:
    """Hierarchical proposal-network sampling
    (reference ray_samplers.py:577-619).

    density_fns[i](ray_samples) -> density [R, S, 1]; one per proposal level.
    Each fn receives the RaySamples (not positions) so fused ray-march fields
    can consume (origins, dirs, midpoints) directly — position tensors then
    never exist in HBM (fields/density_fields.MLPDensityField fused_raymarch);
    plain fields call .get_positions() themselves. `updated` gates gradient
    flow to the proposal densities (a traced bool, stop_gradient switching).
    `anneal` exponentiates the weights.
    Returns (final_samples, weights_list, samples_list).
    """
    n = len(num_proposal_samples_per_ray)
    assert len(density_fns) == n
    weights_list: List[jax.Array] = []
    samples_list: List[RaySamples] = []

    if rng is None:
        rngs = [None] * (n + 1)
    else:
        rngs = list(jax.random.split(rng, n + 1))

    weights = None
    ray_samples = None
    for i_level in range(n + 1):
        is_prop = i_level < n
        num_samples = (
            num_proposal_samples_per_ray[i_level] if is_prop else num_nerf_samples_per_ray
        )
        if i_level == 0:
            ray_samples = spaced_sample(
                ray_bundle,
                num_samples,
                spacing_kind=initial_spacing_kind,
                train_stratified=True,
                single_jitter=single_jitter,
                train=train,
                rng=rngs[i_level],
            )
        else:
            annealed = jnp.power(weights, anneal)
            ray_samples = pdf_sample(
                ray_bundle,
                ray_samples,
                annealed,
                num_samples,
                include_original=False,
                single_jitter=single_jitter,
                train=train,
                rng=rngs[i_level],
            )
        if is_prop:
            density = density_fns[i_level](ray_samples)
            # Gradient to the proposal net only on scheduled update steps.
            density = jnp.where(
                jnp.asarray(updated), density, jax.lax.stop_gradient(density)
            )
            weights = ray_samples.get_weights(density)
            weights_list.append(weights)
            samples_list.append(ray_samples)

    return ray_samples, weights_list, samples_list


def uniform_lin_disp_piecewise_sample(*args, **kwargs):
    """Convenience alias for the nerfacto initial sampler
    (reference ray_samplers.py:225-247)."""
    kwargs.setdefault("spacing_kind", "piecewise")
    return spaced_sample(*args, **kwargs)
