"""Loss library: proposal/interlevel, distortion, normals, and the fork's
cross-spectral thermal losses.

Behavioral spec: reference `nerfstudio/model_components/losses.py`
(`outer/lossfun_outer:57-107`, `interlevel_loss:117-137`,
`lossfun_distortion/distortion_loss:139-160`, orientation/pred-normal
`:205-228`, `scale_gradients_by_distance_squared:554-574`, thermal set
`tv_density_loss:593`, `tv_pixel_loss:602`, `pixel_grad:623`,
`cross_channel_loss:637`).

TPU note: the reference's thermal pixel losses filter rays with boolean
indexing (dynamic shapes). Here they are masked means over the static 2x2
patch layout — numerically identical because each patch is modality-pure
(patches are sampled within one image, see data/pixel_samplers.py).
"""

from typing import List

import jax
import jax.numpy as jnp

from nerfstudio_thermal_tpu.cameras.rays import RaySamples
from nerfstudio_thermal_tpu.model_components.ray_samplers import searchsorted_batched

EPS = 1.0e-7


def mse_loss(pred: jax.Array, target: jax.Array) -> jax.Array:
    return jnp.mean((pred - target) ** 2)


def l1_loss(pred: jax.Array, target: jax.Array) -> jax.Array:
    return jnp.mean(jnp.abs(pred - target))


def masked_mean(values: jax.Array, mask: jax.Array) -> jax.Array:
    """Mean over elements where mask is 1 (static-shape replacement for the
    reference's boolean filtering)."""
    denom = jnp.maximum(jnp.sum(mask), 1.0)
    return jnp.sum(values * mask) / denom


def ray_samples_to_sdist(ray_samples: RaySamples) -> jax.Array:
    """Bin edges in normalized spacing domain [R, S+1] (reference :109-114)."""
    return jnp.concatenate(
        [ray_samples.spacing_starts[..., 0], ray_samples.spacing_ends[..., -1:, 0]],
        axis=-1,
    )


def outer(t0_starts, t0_ends, t1_starts, t1_ends, y1):
    """Sum of y1 histogram mass within each (t0) interval (reference :57-86).

    Gather-free: cy1 is a non-decreasing cumulative histogram aligned with
    the sorted t1 edges, so the indexed lookups reduce to masked max/min
    (see ray_samplers.take_below_above)."""
    from nerfstudio_thermal_tpu.model_components.ray_samplers import take_below_above
    from nerfstudio_thermal_tpu.utils.math import cumsum_mxu

    cy1 = jnp.concatenate(
        [jnp.zeros_like(y1[..., :1]), cumsum_mxu(y1, axis=-1)], axis=-1
    )
    cy1_lo, _ = take_below_above(t1_starts, t0_starts, cy1[..., :-1])
    _, cy1_hi = take_below_above(t1_ends, t0_ends, cy1[..., 1:])
    return cy1_hi - cy1_lo


def lossfun_outer(t, w, t_env, w_env):
    """Proposal bound violation (reference :89-107)."""
    w_outer = outer(t[..., :-1], t[..., 1:], t_env[..., :-1], t_env[..., 1:], w_env)
    return jnp.clip(w - w_outer, 0.0, None) ** 2 / (w + EPS)


def interlevel_loss(weights_list: List[jax.Array], ray_samples_list: List[RaySamples]):
    """MipNeRF-360 proposal loss (reference :117-137)."""
    c = jax.lax.stop_gradient(ray_samples_to_sdist(ray_samples_list[-1]))
    w = jax.lax.stop_gradient(weights_list[-1][..., 0])
    loss = 0.0
    for ray_samples, weights in zip(ray_samples_list[:-1], weights_list[:-1]):
        sdist = ray_samples_to_sdist(ray_samples)
        loss = loss + jnp.mean(lossfun_outer(c, w, sdist, weights[..., 0]))
    return loss


def lossfun_distortion(t, w):
    """MipNeRF-360 distortion in s-space (reference :141-152).

    O(S) form of the pairwise double sum: with the midpoints ut sorted
    ascending (true by construction — t are sorted bin edges),
    sum_ij w_i w_j |ut_i - ut_j| = 2 * sum_i w_i (ut_i * W_i - U_i) where
    W/U are exclusive prefix sums of w and w*ut. The naive [R, S, S]
    broadcast costs ~1 ms/step in fwd+bwd tensors on v5e; the prefix sums
    ride the MXU (cumsum_mxu)."""
    from nerfstudio_thermal_tpu.utils.math import cumsum_mxu

    ut = (t[..., 1:] + t[..., :-1]) / 2.0
    w_acc = cumsum_mxu(w, axis=-1, exclusive=True)
    wut_acc = cumsum_mxu(w * ut, axis=-1, exclusive=True)
    loss_inter = 2.0 * jnp.sum(w * (ut * w_acc - wut_acc), axis=-1)
    loss_intra = jnp.sum(w**2 * (t[..., 1:] - t[..., :-1]), axis=-1) / 3.0
    return loss_inter + loss_intra


def distortion_loss(weights_list: List[jax.Array], ray_samples_list: List[RaySamples]):
    """(reference :155-160) — applies to the final level only."""
    c = ray_samples_to_sdist(ray_samples_list[-1])
    w = weights_list[-1][..., 0]
    return jnp.mean(lossfun_distortion(c, w))


def orientation_loss(weights, normals, viewdirs):
    """Ref-NeRF orientation loss (reference :205-217)."""
    n_dot_v = jnp.sum(normals * -viewdirs[..., None, :], axis=-1)
    return jnp.sum(weights[..., 0] * jnp.minimum(0.0, n_dot_v) ** 2, axis=-1)


def pred_normal_loss(weights, normals, pred_normals):
    """(reference :220-227)."""
    return jnp.sum(
        weights[..., 0] * (1.0 - jnp.sum(normals * pred_normals, axis=-1)), axis=-1
    )


@jax.custom_vjp
def _scale_gradient(value, scaling):
    return value


def _scale_gradient_fwd(value, scaling):
    return value, scaling


def _scale_gradient_bwd(scaling, g):
    return g * scaling, None


_scale_gradient.defvjp(_scale_gradient_fwd, _scale_gradient_bwd)


def scale_gradients_by_distance_squared(field_outputs: dict, ray_samples: RaySamples):
    """Radiance-field gradient scaling for unbiased near-camera training
    (reference :558-574)."""
    ray_dist = (ray_samples.starts + ray_samples.ends) / 2.0
    scaling = jnp.clip(ray_dist**2, 0.0, 1.0)
    return {k: _scale_gradient(v, scaling) for k, v in field_outputs.items()}


# ---------------------------------------------------------------------------
# Depth supervision (reference losses.py:229-330)
# ---------------------------------------------------------------------------

URF_SIGMA_SCALE_FACTOR = 3.0


def ds_nerf_depth_loss(weights, termination_depth, steps, lengths, sigma):
    """Depth-supervised NeRF loss (Deng et al. 2022; reference :229-252)."""
    depth_mask = (termination_depth > 0).astype(jnp.float32)
    loss = (
        -jnp.log(weights + EPS)
        * jnp.exp(-((steps - termination_depth[:, None]) ** 2) / (2 * sigma))
        * lengths
    )
    loss = jnp.sum(loss, axis=-2) * depth_mask
    return jnp.mean(loss)


def urban_radiance_field_depth_loss(
    weights, termination_depth, predicted_depth, steps, sigma
):
    """URF lidar losses (Rematas et al. 2022; reference :254-290)."""
    depth_mask = (termination_depth > 0).astype(jnp.float32)
    expected_depth_loss = (termination_depth - predicted_depth) ** 2

    std = sigma / URF_SIGMA_SCALE_FACTOR
    term = termination_depth[:, None]
    log_prob = -0.5 * ((steps - term) / std) ** 2 - jnp.log(
        std * jnp.sqrt(2.0 * jnp.pi)
    )
    near_mask = (steps <= term + sigma) & (steps >= term - sigma)
    near = (weights - jnp.exp(log_prob)) ** 2
    near = jnp.sum(near_mask * near, axis=-2)
    empty_mask = steps < term - sigma
    empty = jnp.sum(empty_mask * weights**2, axis=-2)
    loss = (expected_depth_loss + near + empty) * depth_mask
    return jnp.mean(loss)


def depth_loss(
    weights,
    ray_samples: RaySamples,
    termination_depth,
    predicted_depth,
    sigma,
    directions_norm,
    is_euclidean: bool,
    depth_loss_type: str = "ds_nerf",
):
    """Depth loss dispatcher (reference :293-330)."""
    if not is_euclidean:
        termination_depth = termination_depth * directions_norm
    steps = (ray_samples.starts + ray_samples.ends) / 2.0
    if depth_loss_type == "ds_nerf":
        lengths = ray_samples.ends - ray_samples.starts
        return ds_nerf_depth_loss(weights, termination_depth, steps, lengths, sigma)
    if depth_loss_type == "urf":
        return urban_radiance_field_depth_loss(
            weights, termination_depth, predicted_depth, steps, sigma
        )
    raise NotImplementedError(f"depth loss type {depth_loss_type}")


def depth_ranking_loss(rendered_depth, gt_depth):
    """SparseNeRF depth ranking over PairPixelSampler layouts
    (reference :577-590)."""
    m = 1e-4
    dpt_diff = gt_depth[::2, :] - gt_depth[1::2, :]
    out_diff = rendered_depth[::2, :] - rendered_depth[1::2, :] + m
    differing_signs = jnp.sign(dpt_diff) != jnp.sign(out_diff)
    per = jnp.where(differing_signs, out_diff * jnp.sign(out_diff), jnp.nan)
    return jnp.nanmean(per)


# ---------------------------------------------------------------------------
# Thermal (cross-spectral) losses — the fork's additions
# ---------------------------------------------------------------------------


def tv_density_loss(densities: jax.Array, num_samples: int) -> jax.Array:
    """L1 between densities at points and their 6 neighbor offsets
    (reference :593-599; densities layout [7 * num_samples, 1]: points first,
    then the 6 neighbor blocks)."""
    base = densities[:num_samples]
    reps = densities[num_samples:].shape[0] // num_samples
    tiled = jnp.tile(base, (reps, 1))
    return jnp.mean(jnp.abs(densities[num_samples:] - tiled))


def tv_pixel_loss(pred_thermal: jax.Array, is_thermal: jax.Array) -> jax.Array:
    """2x2-patch total variation on predicted thermal at RGB pixels
    (reference :602-620). pred_thermal [N, 1]; rays in flattened 2x2-patch
    order; masked-mean over RGB patches."""
    patch_size = 2
    patches = pred_thermal.reshape(-1, patch_size**2)
    rgb_mask = (1.0 - is_thermal).reshape(-1, patch_size**2)[:, 0]
    tv = (
        jnp.abs(patches[:, 0] - patches[:, 1])
        + jnp.abs(patches[:, 0] - patches[:, 2])
        + jnp.abs(patches[:, 1] - patches[:, 3])
        + jnp.abs(patches[:, 2] - patches[:, 3])
    )
    return masked_mean(tv, rgb_mask) / patch_size**2


def pixel_grad(img: jax.Array, patch_size: int = 2) -> jax.Array:
    """2x2-patch finite differences (reference :623-634). img [N, 1] ->
    [4, N / 4]."""
    patches = img.reshape(-1, patch_size**2)
    return jnp.stack(
        [
            patches[:, 1] - patches[:, 0],
            patches[:, 2] - patches[:, 0],
            patches[:, 3] - patches[:, 1],
            patches[:, 3] - patches[:, 2],
        ]
    )


def cross_channel_loss(
    pred_thermal: jax.Array, gt_rgb: jax.Array, is_thermal: jax.Array
) -> jax.Array:
    """L1 between 2x2-patch gradients of predicted thermal and grayscale GT
    RGB at RGB pixels (reference :637-651)."""
    patch_size = 2
    rgb_mask = (1.0 - is_thermal).reshape(-1, patch_size**2)[:, 0]
    gt_gray = jnp.mean(gt_rgb, axis=-1, keepdims=True)
    diff = jnp.abs(
        pixel_grad(pred_thermal, patch_size) - pixel_grad(gt_gray, patch_size)
    )
    per_patch = diff[0] + diff[1] + diff[2] + diff[3]
    return masked_mean(per_patch, rgb_mask) / patch_size**2


# ---------------------------------------------------------------------------
# Monocular-prior losses (MonoSDF; reference losses.py:332-347, 467-520 and
# utils/math.py:325-363)
# ---------------------------------------------------------------------------


def monosdf_normal_loss(normal_pred: jax.Array, normal_gt: jax.Array) -> jax.Array:
    """Angular + L1 consistency with a monocular normal prior
    (reference losses.py:332-347)."""
    from nerfstudio_thermal_tpu.utils.math import safe_normalize

    p = safe_normalize(normal_pred)
    g = safe_normalize(normal_gt)
    l1 = jnp.mean(jnp.sum(jnp.abs(p - g), axis=-1))
    cos = jnp.mean(1.0 - jnp.sum(p * g, axis=-1))
    return l1 + cos


def normalized_depth_scale_and_shift(prediction, target, mask):
    """Closed-form least-squares scale/shift aligning a (normalized)
    monocular depth prediction to the target (reference
    utils/math.py:325-363). Shapes [B, ...]; reduces over all but the
    leading dim."""
    axes = tuple(range(1, prediction.ndim))
    m = mask.astype(prediction.dtype)
    a00 = jnp.sum(m * prediction * prediction, axes)
    a01 = jnp.sum(m * prediction, axes)
    a11 = jnp.sum(m, axes)
    b0 = jnp.sum(m * prediction * target, axes)
    b1 = jnp.sum(m * target, axes)
    det = a00 * a11 - a01 * a01
    safe = jnp.abs(det) > 1e-12
    det_s = jnp.where(safe, det, 1.0)
    scale = jnp.where(safe, (a11 * b0 - a01 * b1) / det_s, 0.0)
    shift = jnp.where(safe, (-a01 * b0 + a00 * b1) / det_s, 0.0)
    return scale, shift


def scale_and_shift_invariant_depth_loss(
    prediction, target, mask, alpha: float = 0.5, scales: int = 4
) -> jax.Array:
    """MiDaS scale/shift-invariant depth loss: align prediction per batch
    row, then masked MSE + multi-scale gradient regularizer
    (reference losses.py:350-520). prediction/target/mask: [B, H, W]."""
    scale, shift = normalized_depth_scale_and_shift(prediction, target, mask)
    pred = prediction * scale[:, None, None] + shift[:, None, None]
    m = mask.astype(pred.dtype)
    denom = jnp.maximum(jnp.sum(m), 1.0)
    data = jnp.sum(m * (pred - target) ** 2) / denom

    reg = 0.0
    for s in range(scales):
        step = 2**s
        p = pred[:, ::step, ::step]
        t = target[:, ::step, ::step]
        mm = m[:, ::step, ::step]
        diff = (p - t) * mm
        gx = jnp.abs(diff[:, :, 1:] - diff[:, :, :-1]) * mm[:, :, 1:] * mm[:, :, :-1]
        gy = jnp.abs(diff[:, 1:, :] - diff[:, :-1, :]) * mm[:, 1:, :] * mm[:, :-1, :]
        reg = reg + (jnp.sum(gx) + jnp.sum(gy)) / denom
    return data + alpha * reg
