"""Large-table hash-grid encoding: XLA row-gather forward + MXU scatter
backward ("hybrid" path).

Numerical spec: reference `nerfstudio/field_components/encodings.py:401-461`
(torch fallback of HashEncoding): spiral-prime spatial hash, 8-corner
trilinear interpolation, levels concatenated. Matches
`ops.encodings.hash_encode` (the XLA oracle) to float tolerance; tests
compare them.

Why this shape (measured on v5e, tools/diag_hash_r3.py + probes):
- Random gathers lower to a ~0.09 G rows/s scalar-ish path at best. ROW
  gathers from the [L*T, 2] table fetch both features per row — 3.3x the
  two-column formulation the r2 path used (and compile in seconds instead
  of minutes).
- Mosaic's only vector gather (`tpu.dynamic_gather`) shuffles within a
  single (8, 128) vreg — "Multiple source vregs along gather dimension:
  Not implemented" — so no Pallas kernel can beat the XLA gather for
  tables wider than 128 lanes. The forward therefore stays on XLA row
  gathers, which ARE the v5e bound (docs/ROOFLINE_hash.md).
- The backward's table scatter-add (CUDA: atomics; XLA: 0.086 G rows/s
  serial-ish) is recast as a two-level one-hot contraction on the MXU:
  with t = a*128 + b,  d_tab[a, b] = (onehot_hi * g*w)^T @ onehot_lo,
  accumulated per level/corner over query tiles into a VMEM-resident
  [T/128, 128] f32 accumulator. Deterministic, atomic-free, ~4x the XLA
  scatter. One-hots are exact in bf16; the g*w operand is rounded to bf16
  for the MXU pass (8-bit mantissa per contribution — on par with tcnn's
  fp16 atomic scatter) and the dot accumulates f32
  (preferred_element_type).
- The forward's gathered corner features are saved as residuals so the
  position gradient needs NO re-gather (memory ~8*L*N*F floats; at parity
  train shapes ~1.3 GB, well within 16 GB HBM and cheaper than 1.8 s of
  re-gathering).
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

# Query tile for the backward MXU scatter kernel.
_BWD_TILE = 512

_LANES = 128


# ---------------------------------------------------------------------------
# shared index/weight math (XLA side) — mirrors ops.encodings._hash_factors
# ---------------------------------------------------------------------------


def _factors_xla(pos_flat, scalings):
    """pos_flat [N, 3], scalings [L] -> per-dim hash factors & weights [L, N]."""
    hf, hc, wf, wc = [], [], [], []
    for d in range(3):
        scaled = pos_flat[:, d][None, :].astype(jnp.float32) * scalings[:, None]
        floor = jnp.floor(scaled)
        offset = scaled - floor
        prime = jnp.uint32(_PRIMES[d])
        hf.append(floor.astype(jnp.int32).astype(jnp.uint32) * prime)
        hc.append(jnp.ceil(scaled).astype(jnp.int32).astype(jnp.uint32) * prime)
        wf.append(1.0 - offset)
        wc.append(offset)
    return hf, hc, wf, wc


def _bits(corner):
    return ((corner >> 2) & 1, (corner >> 1) & 1, corner & 1)


def _corner_idx(hf, hc, bits, table_size):
    h = (
        (hc[0] if bits[0] else hf[0])
        ^ (hc[1] if bits[1] else hf[1])
        ^ (hc[2] if bits[2] else hf[2])
    )
    return (h & jnp.uint32(table_size - 1)).astype(jnp.int32)


def _corner_w(wf, wc, bits):
    return (
        (wc[0] if bits[0] else wf[0])
        * (wc[1] if bits[1] else wf[1])
        * (wc[2] if bits[2] else wf[2])
    )


# ---------------------------------------------------------------------------
# backward table-gradient kernel (two-level one-hot MXU contraction)
# ---------------------------------------------------------------------------


def _bwd_table_kernel(scaling_ref, pos_ref, g_ref, dtab_ref, *, table_size):
    """Grid (L, NT). pos block [3, TILE]; g block [1, F, TILE];
    dtab block [1, F, T//128, 128] f32, accumulated across NT.

    d_tab[f, a, b] += sum_n onehot_hi[n, a] * (g[f, n] * w[n] * onehot_lo[n, b])
    """
    level = pl.program_id(0)
    t = pl.program_id(1)
    tile = pos_ref.shape[1]
    a_sz = table_size // _LANES

    @pl.when(t == 0)
    def _():
        dtab_ref[...] = jnp.zeros_like(dtab_ref)

    # in-kernel factors (same uint32 mul/xor mix as the one-hot kernel)
    hf, hc, wf, wc = [], [], [], []
    scaling = scaling_ref[level]
    for d in range(3):
        scaled = pos_ref[d : d + 1, :].astype(jnp.float32) * scaling
        floor = jnp.floor(scaled)
        offset = scaled - floor
        prime = jnp.uint32(_PRIMES[d])
        hf.append(floor.astype(jnp.int32).astype(jnp.uint32) * prime)
        hc.append(jnp.ceil(scaled).astype(jnp.int32).astype(jnp.uint32) * prime)
        wf.append(1.0 - offset)
        wc.append(offset)

    g = g_ref[0].astype(jnp.float32)  # [F, TILE]

    iota_b = jax.lax.broadcasted_iota(jnp.int32, (tile, _LANES), 1)
    a_chunk = a_sz
    n_chunks = 1

    for c in range(8):
        bits = _bits(c)
        idx = _corner_idx(hf, hc, bits, table_size)  # [1, TILE]
        w = _corner_w(wf, wc, bits)  # [1, TILE]
        hi = (idx >> 7).T  # [TILE, 1]
        lo = (idx & (_LANES - 1)).T
        # one-hots are exact in bf16; MXU accumulates f32
        lo_oh = jnp.where(iota_b == lo, 1.0, 0.0)
        gw0 = ((g[0:1] * w).T * lo_oh).astype(jnp.bfloat16)  # [TILE, 128]
        gw1 = ((g[1:2] * w).T * lo_oh).astype(jnp.bfloat16)
        for k in range(n_chunks):
            iota_k = (
                jax.lax.broadcasted_iota(jnp.int32, (tile, a_chunk), 1)
                + k * a_chunk
            )
            a_oh = jnp.where(iota_k == hi, 1.0, 0.0).astype(jnp.bfloat16)
            sl = slice(k * a_chunk, (k + 1) * a_chunk)
            dtab_ref[0, 0, sl, :] += jax.lax.dot_general(
                a_oh, gw0,
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=dot_precision(a_oh, gw0),
            )
            dtab_ref[0, 1, sl, :] += jax.lax.dot_general(
                a_oh, gw1,
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=dot_precision(a_oh, gw1),
            )


def _use_interpret() -> bool:
    return jax.devices()[0].platform != "tpu"


def _scatter_mxu(pos_t, g_t, scalings, table_size, num_levels, f):
    """d_table via the MXU kernel. pos_t [3, N], g_t [L, F, N] (g*... raw
    output grads; the kernel applies the trilerp weights itself)."""
    a_sz = table_size // _LANES
    # keep tile*a_sz (the one-hot area) at the budget that compiles and
    # fits VMEM: 512x1024 works for 2^17; shrink the query tile for bigger
    # tables instead of chunking (chunked 64-matmul unrolls crash the
    # Mosaic compile helper)
    tile = max(128, min(_BWD_TILE, (512 * 1024) // max(a_sz, 1)))
    n = pos_t.shape[1]
    pad = (-n) % tile
    if pad:
        pos_t = jnp.pad(pos_t, ((0, 0), (0, pad)))
        g_t = jnp.pad(g_t, ((0, 0), (0, 0), (0, pad)))
    nt = pos_t.shape[1] // tile
    a_sz = table_size // _LANES
    scal = scalings.reshape(num_levels).astype(jnp.float32)

    dtab = pl.pallas_call(
        functools.partial(_bwd_table_kernel, table_size=table_size),
        grid=(num_levels, nt),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((3, tile), lambda l, t: (0, t)),
            pl.BlockSpec((1, f, tile), lambda l, t: (l, 0, t)),
        ],
        out_specs=pl.BlockSpec((1, f, a_sz, _LANES), lambda l, t: (l, 0, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((num_levels, f, a_sz, _LANES), jnp.float32),
        interpret=_use_interpret(),
    )(scal, pos_t, g_t)
    # [L, F, A, 128] -> [L*T, F]
    return jnp.transpose(dtab.reshape(num_levels, f, table_size), (0, 2, 1)).reshape(
        num_levels * table_size, f
    )


# ---------------------------------------------------------------------------
# hybrid encode: XLA row-gather fwd (+ saved corner features), MXU bwd
# ---------------------------------------------------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def hash_encode_hybrid(
    table: jax.Array,
    positions: jax.Array,
    scalings: jax.Array,
    table_size: int,
    compute_dtype=jnp.float32,
) -> jax.Array:
    """Drop-in for `ops.encodings.hash_encode`, tuned for large tables on
    TPU. table: [L * table_size, F=2]; positions: [..., 3]; scalings: [L].
    Returns [..., L * F]."""
    # primal path: no residual stack (inference/eval never needs it)
    out, _, batch_shape, L, f = _fwd_impl(
        table, positions, scalings, table_size, save_vals=False
    )
    out_t = jnp.swapaxes(out, 0, 1).reshape(*batch_shape, L * f)
    return out_t.astype(compute_dtype)


def _fwd_impl(table, positions, scalings, table_size, save_vals):
    num_levels = scalings.shape[0]
    f = table.shape[-1]
    batch_shape = positions.shape[:-1]
    pos_flat = positions.reshape(-1, 3)

    hf, hc, wf, wc = _factors_xla(pos_flat, scalings)
    level_offset = (jnp.arange(num_levels, dtype=jnp.int32) * table_size)[:, None]
    tab_f32 = table.astype(jnp.float32)  # [L*T, F] row layout

    out = None
    vals_list = []
    for c in range(8):
        bits = _bits(c)
        idx = _corner_idx(hf, hc, bits, table_size) + level_offset  # [L, N]
        w = _corner_w(wf, wc, bits)  # [L, N]
        vals = tab_f32[idx]  # ROW gather -> [L, N, F]
        if save_vals:
            vals_list.append(vals)
        contrib = vals * w[..., None]
        out = contrib if out is None else out + contrib
    return out, vals_list, batch_shape, num_levels, f


def _fwd(table, positions, scalings, table_size, compute_dtype):
    out, vals_list, batch_shape, L, f = _fwd_impl(
        table, positions, scalings, table_size, save_vals=True
    )
    # [L, N, F] -> [N, L*F]
    out_t = jnp.swapaxes(out, 0, 1).reshape(*batch_shape, L * f)
    # zero-size dtype token: residuals must be JAX types
    dtype_token = jnp.zeros((0,), table.dtype)
    residuals = (positions, scalings, jnp.stack(vals_list), dtype_token)
    return out_t.astype(compute_dtype), residuals


def _bwd(table_size, compute_dtype, res, g):
    positions, scalings, vals, dtype_token = res  # vals [8, L, N, F]
    num_levels = scalings.shape[0]
    f = vals.shape[-1]
    batch_shape = positions.shape[:-1]
    pos_flat = positions.reshape(-1, 3)
    n = pos_flat.shape[0]

    g_t = jnp.swapaxes(
        g.reshape(-1, num_levels, f).astype(jnp.float32), 0, 1
    )  # [L, N, F]

    # -- table gradient on the MXU (kernel recomputes idx/w in-kernel)
    pos_t = pos_flat.T.astype(jnp.float32)  # [3, N]
    g_lfn = jnp.transpose(g_t, (0, 2, 1))  # [L, F, N]
    d_table = _scatter_mxu(
        pos_t, g_lfn, scalings, table_size, num_levels, f
    ).astype(dtype_token.dtype)

    # -- position gradient from the saved corner features (no re-gather)
    hf, hc, wf, wc = _factors_xla(pos_flat, scalings)
    d_off = [jnp.zeros((num_levels, n), jnp.float32) for _ in range(3)]
    for c in range(8):
        bits = _bits(c)
        g_dot_feat = jnp.sum(g_t * vals[c], axis=-1)  # [L, N]
        ws = [wc[d] if bits[d] else wf[d] for d in range(3)]
        signs = [1.0 if bits[d] else -1.0 for d in range(3)]
        d_off[0] = d_off[0] + g_dot_feat * signs[0] * ws[1] * ws[2]
        d_off[1] = d_off[1] + g_dot_feat * signs[1] * ws[0] * ws[2]
        d_off[2] = d_off[2] + g_dot_feat * signs[2] * ws[0] * ws[1]

    d_positions = jnp.stack(
        [jnp.sum(d_off[d] * scalings[:, None], axis=0) for d in range(3)], axis=-1
    ).reshape(*batch_shape, 3).astype(positions.dtype)
    return d_table, d_positions, jnp.zeros_like(scalings)


hash_encode_hybrid.defvjp(_fwd, _bwd)

# Backwards-compatible name used by the encoding dispatch.
hash_encode_dg = hash_encode_hybrid
