"""Fused Pallas hash-grid encoding kernel (multiresolution, trilinear).

Numerical spec: reference `nerfstudio/field_components/encodings.py:401-461`
(the torch fallback of HashEncoding) — spiral-prime spatial hash, 8-corner
trilinear interpolation, levels concatenated. Bit-exact with
`ops/encodings.hash_encode` (the XLA path), which is itself the parity
oracle; tests compare the two.

TPU-first design
----------------
A hash-grid lookup is a random gather, and random gathers are the measured
wall on v5e (~0.4 G rows/s, scalar-ish path; sub-word gathers ~1000x worse).
Mosaic additionally has no vector integer indexing into VMEM, so a Pallas
kernel cannot "gather" either. Instead, for tables that fit in VMEM the
gather+trilerp is recast as dense MXU math:

    out[n, f] = sum_t A[t, n] * table[t, f],
    A[t, n]   = sum_corners w_c(n) * [hash_c(n) == t]

i.e. build a trilerp-weighted one-hot matrix A with VPU compares and ride the
MXU for the contraction. The backward's scatter-add into the table — the hard
part of a CUDA hash grid — becomes the transposed product d_table = g @ A^T,
also on the MXU: no atomics, no serialization, deterministic.

Cost is O(N * table_size) compares, so this wins only while the per-level
table is small: proposal-net-sized tables (2^10..2^12). Above
`PALLAS_MAX_TABLE_SIZE` the wrapper falls back to the XLA gather path
(`ops/encodings.hash_encode`), which is faster there — that crossover is a
hardware property of v5e, not a missing kernel.

Layout: everything runs transposed with the large N dimension in TPU lanes
(positions [3, N], one-hot [T, TILE_N], outputs [L*F, N]) so no 128-lane
padding is wasted on the tiny coordinate/feature dims.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

from nerfstudio_thermal_tpu.ops.pallas.kernel_precision import dot_precision
from jax.experimental.pallas import tpu as pltpu

# Instant-NGP spatial-hash primes (reference encodings.py:412).
_PRIMES = (1, 2654435761, 805459861)

# Largest per-level table the one-hot MXU formulation should handle; above
# this the XLA gather path is faster on v5e (compare cost grows ~linearly in
# table_size while the gather cost is flat).
PALLAS_MAX_TABLE_SIZE = 4096

_TILE_N = 256


def _corner_factors(pos_ref, scaling, tile_n):
    """Hash factors + trilerp weights for one level, lane layout [1, TILE_N].

    Returns (hash_floor, hash_ceil, w_floor, w_ceil): 3-tuples per dimension.
    """
    hf, hc, wf, wc = [], [], [], []
    for d in range(3):
        scaled = pos_ref[d : d + 1, :].astype(jnp.float32) * scaling  # [1, n]
        floor = jnp.floor(scaled)
        ceil = jnp.ceil(scaled)
        offset = scaled - floor
        prime = jnp.uint32(_PRIMES[d])
        hf.append(floor.astype(jnp.int32).astype(jnp.uint32) * prime)
        hc.append(ceil.astype(jnp.int32).astype(jnp.uint32) * prime)
        wf.append(1.0 - offset)
        wc.append(offset)
    return hf, hc, wf, wc


def _corner_idx_w(hf, hc, wf, wc, bits, mask):
    h = (
        (hc[0] if bits[0] else hf[0])
        ^ (hc[1] if bits[1] else hf[1])
        ^ (hc[2] if bits[2] else hf[2])
    )
    idx = (h & jnp.uint32(mask)).astype(jnp.int32)  # [1, n]
    w = (
        (wc[0] if bits[0] else wf[0])
        * (wc[1] if bits[1] else wf[1])
        * (wc[2] if bits[2] else wf[2])
    )
    return idx, w


def _build_onehot(pos_ref, scaling, table_size, tile_n, weighted=True):
    """A[t, n] = sum_c w_c(n) * [idx_c(n) == t]  (or per-corner list)."""
    hf, hc, wf, wc = _corner_factors(pos_ref, scaling, tile_n)
    iota_t = jax.lax.broadcasted_iota(jnp.int32, (table_size, tile_n), 0)
    acc = jnp.zeros((table_size, tile_n), jnp.float32)
    for corner in range(8):
        bits = ((corner >> 2) & 1, (corner >> 1) & 1, corner & 1)
        idx, w = _corner_idx_w(hf, hc, wf, wc, bits, table_size - 1)
        acc = acc + jnp.where(iota_t == idx, w, 0.0)
    return acc


def _fwd_kernel(scaling_ref, pos_ref, table_ref, out_ref):
    """Grid (L, nT). pos [3, N] block (3, TILE_N); table [F, L*T] block (F, T);
    out [L, F, N] block (1, F, TILE_N). scalings: full [L] array in SMEM.
    (3-D blocks because Mosaic requires the block's second-to-last dim to
    equal the array dim or divide by 8; F=2 carved from L*F satisfies
    neither.)"""
    table_size = table_ref.shape[1]
    tile_n = pos_ref.shape[1]
    a = _build_onehot(pos_ref, scaling_ref[pl.program_id(0)], table_size, tile_n)
    # [F, T] x [T, n] -> [F, n] on the MXU.
    out = jax.lax.dot_general(
        table_ref[...].astype(jnp.float32),
        a,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=dot_precision(a),
    )
    out_ref[...] = out[None].astype(out_ref.dtype)


def _bwd_table_kernel(scaling_ref, pos_ref, g_ref, dtable_ref):
    """Grid (L, nT), t innermost. d_table[F, T] += g[F, n] @ A[T, n]^T —
    the scatter-add as an MXU product, accumulated across point tiles."""
    table_size = dtable_ref.shape[1]
    tile_n = pos_ref.shape[1]
    t = pl.program_id(1)

    @pl.when(t == 0)
    def _():
        dtable_ref[...] = jnp.zeros_like(dtable_ref)

    a = _build_onehot(pos_ref, scaling_ref[pl.program_id(0)], table_size, tile_n)
    contrib = jax.lax.dot_general(
        g_ref[0].astype(jnp.float32),
        a,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=dot_precision(a),
    )  # [F, T]
    dtable_ref[...] += contrib


def _bwd_pos_kernel(scaling_ref, pos_ref, table_ref, g_ref, dpos_ref):
    """Grid (nT, L), l innermost. d_pos[3, n] += scaling * d_offset where
    d_offset_d = sum_c (g . feat_c) * sign_d(c) * prod_{e != d} w_e(c)."""
    table_size = table_ref.shape[1]
    tile_n = pos_ref.shape[1]
    level = pl.program_id(1)

    @pl.when(level == 0)
    def _():
        dpos_ref[...] = jnp.zeros_like(dpos_ref)

    scaling = scaling_ref[level]
    hf, hc, wf, wc = _corner_factors(pos_ref, scaling, tile_n)
    iota_t = jax.lax.broadcasted_iota(jnp.int32, (table_size, tile_n), 0)
    table = table_ref[...].astype(jnp.float32)  # [F, T]
    g = g_ref[0].astype(jnp.float32)  # [F, n]

    d_off = [jnp.zeros((1, tile_n), jnp.float32) for _ in range(3)]
    for corner in range(8):
        bits = ((corner >> 2) & 1, (corner >> 1) & 1, corner & 1)
        idx, _ = _corner_idx_w(hf, hc, wf, wc, bits, table_size - 1)
        b = jnp.where(iota_t == idx, 1.0, 0.0)  # [T, n]
        feat = jax.lax.dot_general(
            table,
            b,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=dot_precision(table, b),
        )  # [F, n]
        g_dot_feat = jnp.sum(g * feat, axis=0, keepdims=True)  # [1, n]
        ws = [wc[d] if bits[d] else wf[d] for d in range(3)]
        signs = [1.0 if bits[d] else -1.0 for d in range(3)]
        d_off[0] += g_dot_feat * signs[0] * ws[1] * ws[2]
        d_off[1] += g_dot_feat * signs[1] * ws[0] * ws[2]
        d_off[2] += g_dot_feat * signs[2] * ws[0] * ws[1]

    # offset = pos * scaling - floor  =>  d/d(pos) = scaling
    dpos_ref[...] += jnp.concatenate(d_off, axis=0) * scaling


def _use_interpret() -> bool:
    return jax.devices()[0].platform != "tpu"


def _pad_n(x, tile_n):
    n = x.shape[-1]
    pad = (-n) % tile_n
    if pad:
        x = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(0, pad)])
    return x, n


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def hash_encode_pallas(
    table: jax.Array,
    positions: jax.Array,
    scalings: jax.Array,
    table_size: int,
    compute_dtype=jnp.float32,
) -> jax.Array:
    """Drop-in Pallas replacement for `ops.encodings.hash_encode`.

    table: [L * table_size, F]; positions: [..., 3] in [0, 1]; scalings: [L].
    Returns [..., L * F]. Falls back to the XLA path for tables larger than
    PALLAS_MAX_TABLE_SIZE (see module docstring for why that's faster there).
    """
    out, _ = _fwd(table, positions, scalings, table_size, compute_dtype)
    return out


def _fwd(table, positions, scalings, table_size, compute_dtype):
    if table_size > PALLAS_MAX_TABLE_SIZE:
        from nerfstudio_thermal_tpu.ops.encodings import hash_encode

        return (
            hash_encode(table, positions, scalings, table_size, compute_dtype),
            (table, positions, scalings),
        )

    num_levels = scalings.shape[0]
    f = table.shape[-1]
    batch_shape = positions.shape[:-1]
    pos_t = positions.reshape(-1, 3).T  # [3, N]
    pos_t, n = _pad_n(pos_t, _TILE_N)
    n_pad = pos_t.shape[1]
    n_tiles = n_pad // _TILE_N

    table_t = table.T.astype(jnp.float32)  # [F, L*T]
    scal = scalings.reshape(num_levels).astype(jnp.float32)

    out_t = pl.pallas_call(
        _fwd_kernel,
        grid=(num_levels, n_tiles),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((3, _TILE_N), lambda l, t: (0, t)),
            pl.BlockSpec((f, table_size), lambda l, t: (0, l)),
        ],
        out_specs=pl.BlockSpec((1, f, _TILE_N), lambda l, t: (l, 0, t)),
        out_shape=jax.ShapeDtypeStruct((num_levels, f, n_pad), compute_dtype),
        interpret=_use_interpret(),
    )(scal, pos_t, table_t)

    out = out_t[:, :, :n]
    out = jnp.transpose(out, (2, 0, 1)).reshape(*batch_shape, num_levels * f)
    return out, (table, positions, scalings)


def _bwd(table_size, compute_dtype, res, g):
    table, positions, scalings = res
    if table_size > PALLAS_MAX_TABLE_SIZE:
        from nerfstudio_thermal_tpu.ops.encodings import hash_encode

        _, vjp_fn = jax.vjp(
            lambda tb, p, s: hash_encode(tb, p, s, table_size, compute_dtype),
            table,
            positions,
            scalings,
        )
        return vjp_fn(g)

    num_levels = scalings.shape[0]
    f = table.shape[-1]
    batch_shape = positions.shape[:-1]
    pos_t = positions.reshape(-1, 3).T
    pos_t, n = _pad_n(pos_t, _TILE_N)
    n_pad = pos_t.shape[1]
    n_tiles = n_pad // _TILE_N

    # g: [..., L*F] -> [L*F, N] (padded tail g = 0 contributes nothing).
    g_t = jnp.transpose(
        g.reshape(-1, num_levels, f).astype(jnp.float32), (1, 2, 0)
    )  # [L, F, N]
    g_t, _ = _pad_n(g_t, _TILE_N)

    table_t = table.T.astype(jnp.float32)
    scal = scalings.reshape(num_levels).astype(jnp.float32)

    dtable_t = pl.pallas_call(
        _bwd_table_kernel,
        grid=(num_levels, n_tiles),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((3, _TILE_N), lambda l, t: (0, t)),
            pl.BlockSpec((1, f, _TILE_N), lambda l, t: (l, 0, t)),
        ],
        out_specs=pl.BlockSpec((f, table_size), lambda l, t: (0, l)),
        out_shape=jax.ShapeDtypeStruct((f, num_levels * table_size), jnp.float32),
        interpret=_use_interpret(),
    )(scal, pos_t, g_t)

    dpos_t = pl.pallas_call(
        _bwd_pos_kernel,
        grid=(n_tiles, num_levels),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((3, _TILE_N), lambda t, l: (0, t)),
            pl.BlockSpec((f, table_size), lambda t, l: (0, l)),
            pl.BlockSpec((1, f, _TILE_N), lambda t, l: (l, 0, t)),
        ],
        out_specs=pl.BlockSpec((3, _TILE_N), lambda t, l: (0, t)),
        out_shape=jax.ShapeDtypeStruct((3, n_pad), jnp.float32),
        interpret=_use_interpret(),
    )(scal, pos_t, table_t, g_t)

    d_table = dtable_t.T.astype(table.dtype)
    d_pos = (
        dpos_t[:, :n].T.reshape(*batch_shape, 3).astype(positions.dtype)
    )
    return d_table, d_pos, jnp.zeros_like(scalings)


hash_encode_pallas.defvjp(_fwd, _bwd)
