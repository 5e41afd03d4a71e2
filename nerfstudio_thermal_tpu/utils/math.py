"""Math utilities (PSNR/SSIM and friends).

PSNR/SSIM replace the reference's torchmetrics dependency
(reference nerfacto.py:247-253); SSIM follows the standard Wang et al. 2004
formulation with an 11x11 Gaussian window, matching
torchmetrics.functional.structural_similarity_index_measure defaults.
"""

from typing import Optional

import jax
import numpy as np
import jax.numpy as jnp


def psnr(pred: jax.Array, target: jax.Array, mask: Optional[jax.Array] = None):
    """Peak signal-to-noise ratio, data range 1.0. mask broadcasts over
    elements (masked PSNR = PSNR of the masked subset)."""
    se = (pred - target) ** 2
    if mask is None:
        mse = jnp.mean(se)
    else:
        mask = jnp.broadcast_to(mask, se.shape)
        mse = jnp.sum(se * mask) / jnp.maximum(jnp.sum(mask), 1.0)
    return -10.0 * jnp.log10(jnp.maximum(mse, 1e-12))


def _gaussian_kernel(size: int = 11, sigma: float = 1.5):
    x = jnp.arange(size, dtype=jnp.float32) - (size - 1) / 2.0
    g = jnp.exp(-(x**2) / (2 * sigma**2))
    g = g / g.sum()
    return g


def ssim(
    pred: jax.Array,  # [H, W, C] in [0, 1]
    target: jax.Array,
    data_range: float = 1.0,
    kernel_size: int = 11,
    sigma: float = 1.5,
    k1: float = 0.01,
    k2: float = 0.03,
):
    """Structural similarity over a full image (mean over pixels/channels)."""
    c1 = (k1 * data_range) ** 2
    c2 = (k2 * data_range) ** 2
    kernel = _gaussian_kernel(kernel_size, sigma)

    def blur(img):
        # separable gaussian along H then W, per channel; 'valid' padding
        out = jnp.apply_along_axis(
            lambda a: jnp.convolve(a, kernel, mode="valid"), 0, img
        )
        out = jnp.apply_along_axis(
            lambda a: jnp.convolve(a, kernel, mode="valid"), 1, out
        )
        return out

    mu_x = blur(pred)
    mu_y = blur(target)
    mu_xx = blur(pred * pred)
    mu_yy = blur(target * target)
    mu_xy = blur(pred * target)

    sigma_x = mu_xx - mu_x**2
    sigma_y = mu_yy - mu_y**2
    sigma_xy = mu_xy - mu_x * mu_y

    num = (2 * mu_x * mu_y + c1) * (2 * sigma_xy + c2)
    den = (mu_x**2 + mu_y**2 + c1) * (sigma_x + sigma_y + c2)
    return jnp.mean(num / den)


def safe_normalize(v: jax.Array, eps: float = 1e-12) -> jax.Array:
    """Unit-normalize with a finite gradient at v == 0 (double-where: the
    norm's 0/0 gradient would otherwise poison autodiff even under a
    maximum() clamp — 0 * NaN = NaN in the VJP)."""
    s = jnp.sum(v * v, axis=-1, keepdims=True)
    safe = s > eps * eps
    nrm = jnp.sqrt(jnp.where(safe, s, 1.0))
    return jnp.where(safe, v / nrm, v)


def cumsum_mxu(
    x: jax.Array, axis: int = -1, exclusive: bool = False, reverse: bool = False
) -> jax.Array:
    """Cumulative sum expressed as a triangular-ones matmul.

    XLA lowers cumsum on TPU to a full-width reduce-window on the VPU
    (~180 us for [8192, 128] measured on v5e); the same O(S^2) work as a
    [*, S] @ [S, S] matmul against a triangular ones matrix rides the MXU
    (~2 us) and its backward is just the transposed matmul. Use for scans
    along sample axes (S up to a few hundred); falls back to jnp.cumsum
    when the axis is long enough that the matmul's S^2 FLOPs stop being
    free."""
    size = x.shape[axis]
    if size > 1024:
        if reverse:
            x = jnp.flip(x, axis)
        out = jnp.cumsum(x, axis=axis)
        if exclusive:
            pad = [(0, 0)] * x.ndim
            pad[axis % x.ndim] = (1, 0)
            out = jnp.pad(out, pad)[
                tuple(
                    slice(0, -1) if d == axis % x.ndim else slice(None)
                    for d in range(x.ndim)
                )
            ]
        if reverse:
            out = jnp.flip(out, axis)
        return out
    xl = jnp.moveaxis(x, axis, -1)
    i = jnp.arange(size)
    cmp = (i[:, None] < i[None, :]) if exclusive else (i[:, None] <= i[None, :])
    if reverse:
        cmp = cmp.T
    m = cmp.astype(xl.dtype)
    # HIGHEST: TPU DEFAULT-precision matmuls round f32 operands to bf16 —
    # transmittance/CDF sums must stay exact (the jnp.cumsum they replace
    # is); the triangular matmul stays far cheaper than the reduce-window
    # even at 6 MXU passes
    out = jnp.matmul(xl, m, precision=jax.lax.Precision.HIGHEST)
    return jnp.moveaxis(out, -1, axis)


def broadcast_rows_mxu(u: jax.Array, num_repeats: int) -> jax.Array:
    """Repeat each row of [R, K] `num_repeats` times -> [R*S, K], written as
    a matmul ([R, K] @ [K, S*K] selector, then a free row-major reshape).

    The usual broadcast_to(u[:, None], (R, S, K)) has a VJP that reduces an
    [R, S, K] tensor over the middle axis — with K small (16/32 per-ray
    features) that tensor wastes the 128-lane dim and costs ~1 ms/step on
    v5e. Both directions of the matmul form ride the MXU."""
    r, k = u.shape
    cols = jnp.arange(num_repeats * k)
    m = (cols[None, :] % k == jnp.arange(k)[:, None]).astype(u.dtype)
    # HIGHEST: DEFAULT would round the f32 payload (ray features, origins)
    # to bf16 on TPU; the selector is exact 0/1 either way
    return jnp.matmul(u, m, precision=jax.lax.Precision.HIGHEST).reshape(
        r * num_repeats, k
    )


def safe_norm(x: jax.Array, axis=-1) -> jax.Array:
    """L2 norm with a zero (not NaN) gradient at x == 0, matching torch's
    subgradient convention (double-where pattern)."""
    s = jnp.sum(x * x, axis=axis)
    nonzero = s > 0
    return jnp.where(nonzero, jnp.sqrt(jnp.where(nonzero, s, 1.0)), 0.0)


# ---------------------------------------------------------------------------
# Conical-frustum gaussians (MipNeRF IPE; reference utils/math.py:108-200)
# ---------------------------------------------------------------------------


def conical_frustum_to_gaussian_diag(origins, directions, starts, ends, radius):
    """Gaussian approximation of a conical frustum; returns (means [..., 3],
    cov_diag [..., 3]) — the diagonal is all the integrated positional
    encoding needs (reference math.py:161-187 + NeRFEncoding covs usage)."""
    mu = (starts + ends) / 2.0
    hw = (ends - starts) / 2.0
    means = origins + directions * (
        mu + (2.0 * mu * hw**2.0) / (3.0 * mu**2.0 + hw**2.0)
    )
    dir_variance = (hw**2) / 3 - (4 / 15) * (
        (hw**4 * (12 * mu**2 - hw**2)) / (3 * mu**2 + hw**2) ** 2
    )
    radius_variance = radius**2 * (
        (mu**2) / 4 + (5 / 12) * hw**2 - 4 / 15 * (hw**4) / (3 * mu**2 + hw**2)
    )
    # diag(cov) = dir_var * d_i^2 + radius_var * (1 - d_i^2 / |d|^2)
    d_sq = directions**2
    d_mag_sq = jnp.maximum(jnp.sum(d_sq, axis=-1, keepdims=True), 1e-10)
    cov_diag = dir_variance * d_sq + radius_variance * (1.0 - d_sq / d_mag_sq)
    return means, cov_diag


def expected_sin(x_means, x_vars):
    """E[sin(y)], y ~ N(x_means, x_vars) (reference math.py:190-200)."""
    return jnp.exp(-0.5 * x_vars) * jnp.sin(x_means)


# ---------------------------------------------------------------------------
# Polyhedron bases for Fourier features (MipNeRF-360; reference
# utils/math.py:366-520, adapted from multinerf geopoly)
# ---------------------------------------------------------------------------


def _columnwise_sq_dist(x: np.ndarray, y: np.ndarray) -> np.ndarray:
    sx = np.sum(x**2, 0)
    sy = np.sum(y**2, 0)
    return sx[:, None] + sy[None, :] - 2 * x.T @ y


def _tesselate_geodesic(verts: np.ndarray, faces: np.ndarray, v: int,
                        eps: float = 1e-4) -> np.ndarray:
    if v < 1:
        raise ValueError("tesselation factor must be >= 1")
    weights = []
    for i in range(v + 1):
        for j in range(v + 1 - i):
            weights.append((i, j, v - (i + j)))
    weights = np.asarray(weights, np.float64) / v
    out = []
    for face in faces:
        nv = weights @ verts[face]
        nv /= np.sqrt(np.sum(nv**2, 1, keepdims=True))
        out.append(nv)
    out = np.concatenate(out, 0)
    sq = _columnwise_sq_dist(out.T, out.T)
    assignment = np.array([np.min(np.argwhere(d <= eps)) for d in sq])
    return out[np.unique(assignment)]


def generate_polyhedron_basis(
    basis_shape: str = "octahedron",
    angular_tesselation: int = 1,
    remove_symmetries: bool = True,
    eps: float = 1e-4,
) -> np.ndarray:
    """3D Fourier basis from a tesselated polyhedron (reference
    utils/math.py:440-520). Returns [n, 3] (flipped last axis like the
    reference)."""
    import itertools
    import math as _math

    if basis_shape == "icosahedron":
        a = (_math.sqrt(5) + 1) / 2
        verts = np.asarray(
            [(-1, 0, a), (1, 0, a), (-1, 0, -a), (1, 0, -a),
             (0, a, 1), (0, a, -1), (0, -a, 1), (0, -a, -1),
             (a, 1, 0), (-a, 1, 0), (a, -1, 0), (-a, -1, 0)],
            np.float64,
        ) / _math.sqrt(a + 2)
        faces = np.asarray(
            [(0, 4, 1), (0, 9, 4), (9, 5, 4), (4, 5, 8), (4, 8, 1),
             (8, 10, 1), (8, 3, 10), (5, 3, 8), (5, 2, 3), (2, 7, 3),
             (7, 10, 3), (7, 6, 10), (7, 11, 6), (11, 0, 6), (0, 1, 6),
             (6, 1, 10), (9, 0, 11), (9, 11, 2), (9, 2, 5), (7, 2, 11)]
        )
        verts = _tesselate_geodesic(verts, faces, angular_tesselation, eps)
    elif basis_shape == "octahedron":
        verts = np.asarray(
            [(0, 0, -1), (0, 0, 1), (0, -1, 0), (0, 1, 0), (-1, 0, 0), (1, 0, 0)],
            np.float64,
        )
        corners = np.asarray(list(itertools.product([-1, 1], repeat=3)), np.float64)
        pairs = np.argwhere(_columnwise_sq_dist(corners.T, verts.T) == 2)
        faces = np.sort(pairs[:, 1].reshape(3, -1).T, 1)
        verts = _tesselate_geodesic(verts, faces, angular_tesselation, eps)
    else:
        raise ValueError(f"unknown basis shape {basis_shape}")

    if remove_symmetries:
        match = _columnwise_sq_dist(verts.T, -verts.T) < eps
        verts = verts[np.any(np.triu(match), 1)]
    return verts[:, ::-1].astype(np.float32)
