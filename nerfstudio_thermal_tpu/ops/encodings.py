"""Input encodings: multiresolution hash grid, spherical harmonics, sinusoidal.

Behavioral spec: reference `nerfstudio/field_components/encodings.py`
(HashEncoding torch fallback at :401-461 defines the exact hash/interp
semantics; SHEncoding at :755; NeRFEncoding at :98-180). The hash math here is
bit-exact with the reference mod 2^19 (uint32 wraparound preserves the low
bits the table index uses), so trained tables are comparable across stacks.

TPU notes: the gather-heavy hash lookup is expressed as one batched gather of
all 8 corners x L levels; XLA lowers it to HBM gathers and the backward to
scatter-adds. `ops/pallas/hash_encoding.py` provides a fused Pallas kernel for
the same semantics on the training hot path.
"""

import functools
import math
from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

# Instant-NGP spatial-hash primes (reference encodings.py:412).
_HASH_PRIMES = np.array([1, 2654435761, 805459861], dtype=np.uint32)

# The 8 trilinear-interpolation corners; bit=1 selects ceil, bit=0 floor.
# Ordering matches the reference's corner enumeration (encodings.py:428-437).
_CORNER_BITS = np.array(
    [[(c >> 2) & 1, (c >> 1) & 1, c & 1] for c in range(8)], dtype=np.bool_
)  # [8, 3] (x, y, z)


def hash_grid_scalings(num_levels: int, min_res: int, max_res: int) -> np.ndarray:
    """Per-level grid resolutions: floor(min_res * growth^level).

    growth = exp((ln max - ln min) / (L - 1)) — reference encodings.py:344.
    """
    if num_levels > 1:
        growth = math.exp((math.log(max_res) - math.log(min_res)) / (num_levels - 1))
    else:
        growth = 1.0
    levels = np.arange(num_levels)
    return np.floor(min_res * growth**levels).astype(np.float32)


def spatial_hash(coords: jax.Array, table_size: int) -> jax.Array:
    """Instant-NGP spatial hash of integer grid coords.

    coords: int32 [..., 3] (non-negative grid indices).
    Returns int32 [...] in [0, table_size). table_size must be a power of 2.
    """
    c = coords.astype(jnp.uint32) * _HASH_PRIMES
    h = c[..., 0] ^ c[..., 1] ^ c[..., 2]
    return (h & jnp.uint32(table_size - 1)).astype(jnp.int32)


def _hash_factors(positions, scalings, table_size):
    """Per-dimension hash factors and trilerp weights, [L, N] each.

    Structuring the corner hash as an xor of per-dimension products means no
    [N, L, 8, 3] corner buffer is ever materialized (that OOMs at train
    shapes: 2M pts x 5 levels x 8 corners x 3 coords). All intermediates live
    in transposed [L, N] layout: the large N dim sits in the TPU lane
    dimension (128-wide), so nothing is padded. (A [N*L, F=2] layout pads the
    lane dim 64x and OOMs at train shapes.)
    """
    dim_f, dim_c, w_f, w_c = [], [], [], []
    for d in range(3):
        scaled = positions[:, d][None, :].astype(jnp.float32) * scalings[:, None]  # [L, N]
        floor = jnp.floor(scaled)
        offset = scaled - floor
        dim_f.append(floor.astype(jnp.int32).astype(jnp.uint32) * _HASH_PRIMES[d])
        dim_c.append(jnp.ceil(scaled).astype(jnp.int32).astype(jnp.uint32) * _HASH_PRIMES[d])
        w_f.append(1.0 - offset)
        w_c.append(offset)
    return dim_f, dim_c, w_f, w_c


def _corner_index(dim_f, dim_c, bits, table_size, level_offset):
    h = (
        (dim_c[0] if bits[0] else dim_f[0])
        ^ (dim_c[1] if bits[1] else dim_f[1])
        ^ (dim_c[2] if bits[2] else dim_f[2])
    )
    return (h & jnp.uint32(table_size - 1)).astype(jnp.int32) + level_offset


def _corner_weight(w_f, w_c, bits):
    return (
        (w_c[0] if bits[0] else w_f[0])
        * (w_c[1] if bits[1] else w_f[1])
        * (w_c[2] if bits[2] else w_f[2])
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def hash_encode(
    table: jax.Array,
    positions: jax.Array,
    scalings: jax.Array,
    table_size: int,
    compute_dtype=jnp.float32,
) -> jax.Array:
    """Multiresolution hash-grid encoding (pure-XLA path).

    Args:
        table: [L * table_size, F] feature table (levels concatenated).
        positions: [..., 3] in [0, 1].
        scalings: [L] per-level grid resolution.
        table_size: entries per level (power of 2).

    Returns:
        [..., L * F] trilinearly interpolated features.

    Memory: a custom VJP saves only (table, positions) and *recomputes* the 8
    corner gathers in the backward, scatter-adding table gradients — the
    default AD would otherwise hold all 8 gathered [..., L, F] buffers across
    the whole proposal/field stack (tens of GB at 8192x256 train shapes).
    """
    return _hash_encode_fwd_impl(table, positions, scalings, table_size, compute_dtype)


def _hash_encode_fwd_impl(table, positions, scalings, table_size, compute_dtype):
    num_levels = scalings.shape[0]
    features_per_level = table.shape[-1]
    batch_shape = positions.shape[:-1]
    pos_flat = positions.reshape(-1, 3)

    dim_f, dim_c, w_f, w_c = _hash_factors(pos_flat, scalings, table_size)
    level_offset = (jnp.arange(num_levels, dtype=jnp.int32) * table_size)[:, None]
    # 1-D table columns: gathers of [L, N] indices from a [L*T] vector keep N
    # in the lane dim — zero padding waste (vs [.., F=2]-wide gathers).
    # Gather in f32: sub-word (bf16) gathers hit a ~1000x slower scalar path
    # on TPU; the cast to compute_dtype happens on the interpolated output.
    table_cols = [
        table[:, fc].astype(jnp.float32) for fc in range(features_per_level)
    ]

    out_cols = [None] * features_per_level
    for corner in range(8):
        bits = _CORNER_BITS[corner]
        idx = _corner_index(dim_f, dim_c, bits, table_size, level_offset)  # [L, N]
        w = _corner_weight(w_f, w_c, bits)  # [L, N] f32
        for fc in range(features_per_level):
            contrib = table_cols[fc][idx] * w
            out_cols[fc] = contrib if out_cols[fc] is None else out_cols[fc] + contrib

    out = jnp.stack(out_cols, axis=-1)  # [L, N, F]
    out = jnp.swapaxes(out, 0, 1).astype(compute_dtype)  # [N, L, F]
    return out.reshape(*batch_shape, num_levels * features_per_level)


def _hash_encode_fwd(table, positions, scalings, table_size, compute_dtype):
    out = _hash_encode_fwd_impl(table, positions, scalings, table_size, compute_dtype)
    return out, (table, positions, scalings)


def _hash_encode_bwd(table_size, compute_dtype, res, g):
    table, positions, scalings = res
    num_levels = scalings.shape[0]
    features_per_level = table.shape[-1]
    batch_shape = positions.shape[:-1]
    pos_flat = positions.reshape(-1, 3)
    n = pos_flat.shape[0]

    g = g.reshape(n, num_levels, features_per_level).astype(jnp.float32)
    g_cols = [jnp.swapaxes(g[:, :, fc], 0, 1) for fc in range(features_per_level)]  # [L, N]

    dim_f, dim_c, w_f, w_c = _hash_factors(pos_flat, scalings, table_size)
    level_offset = (jnp.arange(num_levels, dtype=jnp.int32) * table_size)[:, None]
    table_cols = [table[:, fc].astype(jnp.float32) for fc in range(features_per_level)]

    d_table_cols = [
        jnp.zeros((table.shape[0],), jnp.float32) for _ in range(features_per_level)
    ]
    # d(out)/d(offset_d) per corner: +/- product of the other two weights.
    d_off = [jnp.zeros_like(w_f[0]) for _ in range(3)]
    for corner in range(8):
        bits = _CORNER_BITS[corner]
        idx = _corner_index(dim_f, dim_c, bits, table_size, level_offset)  # [L, N]
        w = _corner_weight(w_f, w_c, bits).astype(jnp.float32)
        idx_flat = idx.reshape(-1)
        g_dot_feat = jnp.zeros_like(w)
        for fc in range(features_per_level):
            d_table_cols[fc] = d_table_cols[fc].at[idx_flat].add(
                (g_cols[fc] * w).reshape(-1)
            )
            g_dot_feat = g_dot_feat + g_cols[fc] * table_cols[fc][idx]
        ws = [w_c[d] if bits[d] else w_f[d] for d in range(3)]
        signs = [1.0 if bits[d] else -1.0 for d in range(3)]
        d_off[0] = d_off[0] + g_dot_feat * signs[0] * ws[1] * ws[2]
        d_off[1] = d_off[1] + g_dot_feat * signs[1] * ws[0] * ws[2]
        d_off[2] = d_off[2] + g_dot_feat * signs[2] * ws[0] * ws[1]

    d_table = jnp.stack(d_table_cols, axis=-1).astype(table.dtype)
    # offset = positions * scaling - floor  =>  d/d(positions) = scaling
    d_positions = jnp.stack(
        [jnp.sum(d_off[d] * scalings[:, None], axis=0) for d in range(3)], axis=-1
    ).reshape(*batch_shape, 3).astype(positions.dtype)
    return d_table, d_positions, jnp.zeros_like(scalings)


hash_encode.defvjp(_hash_encode_fwd, _hash_encode_bwd)


class HashEncoding(nn.Module):
    """Instant-NGP multiresolution hash-grid encoding as a flax module.

    Defaults mirror reference encodings.py:324-343. Table init U(-1e-3, 1e-3)
    (reference :375-379).
    """

    num_levels: int = 16
    min_res: int = 16
    max_res: int = 1024
    log2_hashmap_size: int = 19
    features_per_level: int = 2
    hash_init_scale: float = 1e-3
    compute_dtype: jnp.dtype = jnp.float32
    use_pallas: bool = False

    @property
    def table_size(self) -> int:
        return 2**self.log2_hashmap_size

    @property
    def out_dim(self) -> int:
        return self.num_levels * self.features_per_level

    @nn.compact
    def __call__(self, positions: jax.Array) -> jax.Array:
        table = self.param(
            "hash_table",
            lambda key, shape: self.hash_init_scale
            * (2.0 * jax.random.uniform(key, shape) - 1.0),
            (self.table_size * self.num_levels, self.features_per_level),
        )
        scalings = jnp.asarray(
            hash_grid_scalings(self.num_levels, self.min_res, self.max_res)
        )
        if self._dynamic_gather_eligible():
            # Large tables on TPU: in-kernel tpu.dynamic_gather beats the
            # XLA scalar-path gather by orders of magnitude
            # (ops/pallas/hash_gather.py; measured tools/diag_hash_r3.py).
            from nerfstudio_thermal_tpu.ops.pallas.hash_gather import (
                hash_encode_dg,
            )

            return hash_encode_dg(
                table, positions, scalings, self.table_size,
                compute_dtype=self.compute_dtype,
            )
        if self.use_pallas:
            from nerfstudio_thermal_tpu.ops.pallas.hash_encoding import (
                hash_encode_pallas,
            )

            return hash_encode_pallas(
                table, positions, scalings, self.table_size,
                compute_dtype=self.compute_dtype,
            )
        return hash_encode(
            table, positions, scalings, self.table_size, self.compute_dtype
        )

    def _dynamic_gather_eligible(self) -> bool:
        """Route big-table lookups to the dynamic-gather kernel on TPU.

        Small tables keep the one-hot MXU kernel / XLA path; non-TPU
        backends keep XLA (the kernel's interpret mode is for tests).
        Opt out with NS_HASH_DG=0."""
        import os

        from nerfstudio_thermal_tpu.ops.pallas.hash_encoding import (
            PALLAS_MAX_TABLE_SIZE,
        )

        if os.environ.get("NS_HASH_DG", "1") == "0":
            return False
        if self.features_per_level != 2 or self.table_size % 128 != 0:
            return False
        if self.table_size <= PALLAS_MAX_TABLE_SIZE and self.use_pallas:
            return False  # one-hot MXU kernel wins there
        if self.table_size <= 4096:
            return False  # XLA fine at these sizes; keeps tiny-table tests exact
        try:
            return jax.devices()[0].platform == "tpu"
        except Exception:
            return False


# Hardcoded real SH basis, matching reference utils/math.py:29-106.
def sh_encoding(directions: jax.Array, levels: int = 4) -> jax.Array:
    """Real spherical-harmonics components of unit directions, levels in [1,5].

    Returns [..., levels**2].
    """
    assert 1 <= levels <= 5
    x, y, z = directions[..., 0], directions[..., 1], directions[..., 2]
    xx, yy, zz = x * x, y * y, z * z
    comps = [jnp.full_like(x, 0.28209479177387814)]
    if levels > 1:
        comps += [
            0.4886025119029199 * y,
            0.4886025119029199 * z,
            0.4886025119029199 * x,
        ]
    if levels > 2:
        comps += [
            1.0925484305920792 * x * y,
            1.0925484305920792 * y * z,
            0.9461746957575601 * zz - 0.31539156525251999,
            1.0925484305920792 * x * z,
            0.5462742152960396 * (xx - yy),
        ]
    if levels > 3:
        comps += [
            0.5900435899266435 * y * (3 * xx - yy),
            2.890611442640554 * x * y * z,
            0.4570457994644658 * y * (5 * zz - 1),
            0.3731763325901154 * z * (5 * zz - 3),
            0.4570457994644658 * x * (5 * zz - 1),
            1.445305721320277 * z * (xx - yy),
            0.5900435899266435 * x * (xx - 3 * yy),
        ]
    if levels > 4:
        comps += [
            2.5033429417967046 * x * y * (xx - yy),
            1.7701307697799304 * y * z * (3 * xx - yy),
            0.9461746957575601 * x * y * (7 * zz - 1),
            0.6690465435572892 * y * z * (7 * zz - 3),
            0.10578554691520431 * (35 * zz * zz - 30 * zz + 3),
            0.6690465435572892 * x * z * (7 * zz - 3),
            0.47308734787878004 * (xx - yy) * (7 * zz - 1),
            1.7701307697799304 * x * z * (xx - 3 * yy),
            0.6258357354491761 * (xx * (xx - 3 * yy) - yy * (3 * xx - yy)),
        ]
    return jnp.stack(comps, axis=-1)


class FFEncoding(nn.Module):
    """Fourier-feature encoding over an arbitrary basis matrix
    (reference encodings.py:193-264). Input scaled by 2*pi, projected through
    `basis` [in_dim, M], multiplied by 2^linspace frequencies, sin of the
    value and its pi/2 shift; supports integrated encodings via diagonal
    covariances."""

    basis: Any  # static array-like [in_dim, M]
    num_frequencies: int = 1
    min_freq_exp: float = 0.0
    max_freq_exp: float = 0.0
    include_input: bool = False

    @property
    def in_dim(self) -> int:
        return np.asarray(self.basis).shape[0]

    @property
    def out_dim(self) -> int:
        d = np.asarray(self.basis).shape[1] * self.num_frequencies * 2
        if self.include_input:
            d += self.in_dim
        return d

    def __call__(self, in_tensor: jax.Array, covs: Optional[jax.Array] = None) -> jax.Array:
        """covs: optional [..., in_dim, in_dim] covariances for IPE."""
        b = jnp.asarray(np.asarray(self.basis, np.float32))
        scaled = (2.0 * jnp.pi * in_tensor) @ b  # [..., M]
        freqs = 2.0 ** jnp.linspace(
            self.min_freq_exp, self.max_freq_exp, self.num_frequencies
        )
        scaled = (scaled[..., None] * freqs).reshape(*scaled.shape[:-1], -1)
        both = jnp.concatenate([scaled, scaled + jnp.pi / 2.0], axis=-1)
        if covs is None:
            encoded = jnp.sin(both)
        else:
            from nerfstudio_thermal_tpu.utils.math import expected_sin

            input_var = jnp.sum((covs @ b) * b, axis=-2)  # [..., M]
            input_var = (input_var[..., None] * freqs**2).reshape(
                *input_var.shape[:-1], -1
            )
            encoded = expected_sin(both, jnp.concatenate([input_var] * 2, axis=-1))
        if self.include_input:
            encoded = jnp.concatenate([encoded, in_tensor], axis=-1)
        return encoded


def make_rff_encoding(
    in_dim: int, num_frequencies: int, scale: float,
    include_input: bool = False, seed: int = 0,
) -> FFEncoding:
    """Random Fourier features (reference encodings.py:267-282): gaussian
    basis, single frequency."""
    if scale <= 0:
        raise ValueError("RFF encoding scale must be > 0")
    b = np.random.default_rng(seed).normal(0.0, scale, (in_dim, num_frequencies))
    return FFEncoding(basis=tuple(map(tuple, b.astype(np.float32))),
                      num_frequencies=1, include_input=include_input)


def make_polyhedron_ff_encoding(
    num_frequencies: int, min_freq_exp: float, max_freq_exp: float,
    basis_shape: str = "octahedron", basis_subdivisions: int = 1,
    include_input: bool = False,
) -> FFEncoding:
    """MipNeRF-360 polyhedron Fourier features
    (reference encodings.py:285-308)."""
    from nerfstudio_thermal_tpu.utils.math import generate_polyhedron_basis

    basis = generate_polyhedron_basis(basis_shape, basis_subdivisions).T
    return FFEncoding(
        basis=tuple(map(tuple, basis.astype(np.float32))),
        num_frequencies=num_frequencies,
        min_freq_exp=min_freq_exp,
        max_freq_exp=max_freq_exp,
        include_input=include_input,
    )


class SHEncoding(nn.Module):
    """Spherical-harmonic direction encoding (reference encodings.py:755)."""

    levels: int = 4

    @property
    def out_dim(self) -> int:
        return self.levels**2

    def __call__(self, directions: jax.Array) -> jax.Array:
        return sh_encoding(directions, self.levels)


class NeRFEncoding(nn.Module):
    """Multi-scale sinusoidal encoding (reference encodings.py:98-180).

    Input scaled by 2*pi; frequencies 2^linspace(min_freq_exp, max_freq_exp).
    Output [..., in_dim * num_frequencies * 2 (+ in_dim if include_input)].
    """

    in_dim: int = 3
    num_frequencies: int = 2
    min_freq_exp: float = 0.0
    max_freq_exp: float = 1.0
    include_input: bool = False

    @property
    def out_dim(self) -> int:
        d = self.in_dim * self.num_frequencies * 2
        if self.include_input:
            d += self.in_dim
        return d

    def __call__(self, in_tensor: jax.Array, covs: Optional[jax.Array] = None) -> jax.Array:
        """covs: optional [..., in_dim] gaussian variances -> integrated
        positional encoding (MipNeRF; reference encodings.py:152-180)."""
        scaled = 2.0 * jnp.pi * in_tensor
        freqs = 2.0 ** jnp.linspace(
            self.min_freq_exp, self.max_freq_exp, self.num_frequencies
        )
        scaled = scaled[..., None] * freqs  # [..., in_dim, F]
        scaled = scaled.reshape(*scaled.shape[:-2], -1)
        both = jnp.concatenate([scaled, scaled + jnp.pi / 2.0], axis=-1)
        if covs is None:
            encoded = jnp.sin(both)
        else:
            from nerfstudio_thermal_tpu.utils.math import expected_sin

            input_var = covs[..., :, None] * freqs**2
            input_var = input_var.reshape(*input_var.shape[:-2], -1)
            encoded = expected_sin(both, jnp.concatenate([input_var] * 2, axis=-1))
        if self.include_input:
            encoded = jnp.concatenate([encoded, in_tensor], axis=-1)
        return encoded
