"""Large-table hash-grid encoding via in-kernel `tpu.dynamic_gather`.

Numerical spec: reference `nerfstudio/field_components/encodings.py:401-461`
(torch fallback of HashEncoding): spiral-prime spatial hash, 8-corner
trilinear interpolation, levels concatenated. Bit-exact in the hash/index
math with `ops.encodings.hash_encode` (the XLA oracle); tests compare them.

Why this kernel exists
----------------------
XLA lowers random gathers on v5e to a ~0.06-0.09 G rows/s scalar-ish path
(measured, tools/diag_hash_r3.py) — the 2^19-table training path ran at
570 rays/s in round 2. Mosaic, however, exposes `tpu.dynamic_gather` for
2-D operands (jax lowering: pallas/mosaic/lowering.py:_gather_lowering_rule)
as a VECTOR op:

    take_along_axis(op[S, W], idx[S, W], axis=1) -> out[i,j] = op[i, idx[i,j]]

with indices the same shape as the operand (and mod-W index wrap). With a
level's table column resident in VMEM as the [1, W] operand, a whole block
of W hash lookups is ONE vector instruction stream instead of W scalar
loads. The forward computes hash indices + trilerp weights in-kernel
(uint32 multiply/xor, same ops the one-hot kernel already lowers) and
accumulates the 8 corners into the output block across a corner-free grid:
grid (levels, query-blocks), corners unrolled in-kernel.

The backward table-gradient — CUDA's atomic scatter-add — has no Mosaic
scatter op at all. It is recast as a two-level one-hot contraction on the
MXU: with t = a*128 + b (a = t >> 7, b = t & 127),

    d_table[a, b] = sum_n g[n] * onehot_hi[n, a] * onehot_lo[n, b]
                  = (onehot_hi * g)^T  @  onehot_lo        (per level/corner)

tiled over query blocks with the [T/128, 128] accumulator resident in VMEM.
No atomics, no serialization, deterministic. The backward position-gradient
reuses the dynamic-gather to re-fetch corner features (recompute beats
saving ~1.3 GB of residuals).

Layouts: all query-dim tensors run transposed ([3, N] positions, [F, N]
outputs) so the big N dimension sits in TPU lanes.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Instant-NGP spatial-hash primes (reference encodings.py:412).
_PRIMES = (1, 2654435761, 805459861)

# Queries per forward grid step. The dynamic_gather operand is the [1, T]
# table column, and Mosaic requires indices to share that shape, so a step
# always issues T lane-lookups; QB <= T real queries are padded up to T
# (the waste is VPU cycles, not HBM).
_FWD_QB = 1 << 17

# Query tile for the backward MXU scatter: [TILE, T//128] one-hot tiles.
_BWD_TILE = 256

_LANES = 128


def _factors(pos, scaling):
    """Hash factors + trilerp weights from a [3, n] position block."""
    hf, hc, wf, wc = [], [], [], []
    for d in range(3):
        scaled = pos[d : d + 1, :].astype(jnp.float32) * scaling  # [1, n]
        floor = jnp.floor(scaled)
        ceil = jnp.ceil(scaled)
        offset = scaled - floor
        prime = jnp.uint32(_PRIMES[d])
        hf.append(floor.astype(jnp.int32).astype(jnp.uint32) * prime)
        hc.append(ceil.astype(jnp.int32).astype(jnp.uint32) * prime)
        wf.append(1.0 - offset)
        wc.append(offset)
    return hf, hc, wf, wc


def _corner(hf, hc, wf, wc, bits, mask):
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


def _bits(corner):
    return ((corner >> 2) & 1, (corner >> 1) & 1, corner & 1)


# ---------------------------------------------------------------------------
# forward
# ---------------------------------------------------------------------------


def _fwd_kernel(scaling_ref, pos_ref, tab0_ref, tab1_ref, out_ref, *, table_size):
    """Grid (L, NB). pos block [3, QB]; tab{0,1} blocks [1, T] (feature
    columns of this level); out block [1, F, QB] f32."""
    level = pl.program_id(0)
    qb = pos_ref.shape[1]
    hf, hc, wf, wc = _factors(pos_ref[...], scaling_ref[level])

    acc0 = jnp.zeros((1, qb), jnp.float32)
    acc1 = jnp.zeros((1, qb), jnp.float32)
    t0 = tab0_ref[0]  # [1, T]
    t1 = tab1_ref[0]
    for c in range(8):
        idx, w = _corner(hf, hc, wf, wc, _bits(c), table_size - 1)
        if qb < table_size:
            idx_full = jnp.pad(idx, ((0, 0), (0, table_size - qb)))
        else:
            idx_full = idx
        v0 = jnp.take_along_axis(t0, idx_full, axis=1)[:, :qb]
        v1 = jnp.take_along_axis(t1, idx_full, axis=1)[:, :qb]
        acc0 = acc0 + v0 * w
        acc1 = acc1 + v1 * w
    out_ref[...] = jnp.concatenate([acc0, acc1], axis=0)[None]


# ---------------------------------------------------------------------------
# backward: table gradient (two-level one-hot MXU contraction)
# ---------------------------------------------------------------------------


def _bwd_table_kernel(scaling_ref, pos_ref, g_ref, dtab_ref, *, table_size):
    """Grid (L, NT). pos block [3, TILE]; g block [1, F, TILE];
    dtab block [1, F, T//128, 128] f32, accumulated across NT.

    d_tab[f, a, b] += sum_n onehot_hi[n, a] * (g[f, n] * onehot_lo[n, b])
    """
    level = pl.program_id(0)
    t = pl.program_id(1)
    tile = pos_ref.shape[1]
    a_sz = table_size // _LANES

    @pl.when(t == 0)
    def _():
        dtab_ref[...] = jnp.zeros_like(dtab_ref)

    hf, hc, wf, wc = _factors(pos_ref[...], scaling_ref[level])
    g = g_ref[0].astype(jnp.float32)  # [F, TILE]

    iota_a = jax.lax.broadcasted_iota(jnp.int32, (tile, a_sz), 1)
    iota_b = jax.lax.broadcasted_iota(jnp.int32, (tile, _LANES), 1)

    acc0 = jnp.zeros((a_sz, _LANES), jnp.float32)
    acc1 = jnp.zeros((a_sz, _LANES), jnp.float32)
    for c in range(8):
        idx, w = _corner(hf, hc, wf, wc, _bits(c), table_size - 1)  # [1, TILE]
        hi = (idx >> 7).T  # [TILE, 1]
        lo = (idx & (_LANES - 1)).T
        a_oh = jnp.where(iota_a == hi, 1.0, 0.0)  # [TILE, A]
        lo_oh = jnp.where(iota_b == lo, 1.0, 0.0)  # [TILE, 128]
        gw0 = (g[0:1] * w).T  # [TILE, 1]
        gw1 = (g[1:2] * w).T
        acc0 = acc0 + jax.lax.dot_general(
            a_oh, lo_oh * gw0,
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        acc1 = acc1 + jax.lax.dot_general(
            a_oh, lo_oh * gw1,
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
    dtab_ref[...] += jnp.stack([acc0, acc1], axis=0)[None]


# ---------------------------------------------------------------------------
# backward: position gradient (re-gather features, accumulate over levels)
# ---------------------------------------------------------------------------


def _bwd_pos_kernel(
    scaling_ref, pos_ref, tab0_ref, tab1_ref, g_ref, dpos_ref, *, table_size
):
    """Grid (NB, L) — level innermost so dpos accumulates across levels.
    pos block [3, QB]; tab blocks [1, T]; g block [1, F, QB];
    dpos block [3, QB] f32."""
    level = pl.program_id(1)
    qb = pos_ref.shape[1]

    @pl.when(level == 0)
    def _():
        dpos_ref[...] = jnp.zeros_like(dpos_ref)

    scaling = scaling_ref[level]
    hf, hc, wf, wc = _factors(pos_ref[...], scaling)
    g = g_ref[0].astype(jnp.float32)  # [F, QB]
    t0 = tab0_ref[0]  # [1, T]
    t1 = tab1_ref[0]

    d_off = [jnp.zeros((1, qb), jnp.float32) for _ in range(3)]
    for c in range(8):
        bits = _bits(c)
        idx, _w = _corner(hf, hc, wf, wc, bits, table_size - 1)
        if qb < table_size:
            idx_full = jnp.pad(idx, ((0, 0), (0, table_size - qb)))
        else:
            idx_full = idx
        v0 = jnp.take_along_axis(t0, idx_full, axis=1)[:, :qb]
        v1 = jnp.take_along_axis(t1, idx_full, axis=1)[:, :qb]
        g_dot_feat = g[0:1] * v0 + g[1:2] * v1  # [1, QB]
        ws = [wc[d] if bits[d] else wf[d] for d in range(3)]
        signs = [1.0 if bits[d] else -1.0 for d in range(3)]
        d_off[0] += g_dot_feat * signs[0] * ws[1] * ws[2]
        d_off[1] += g_dot_feat * signs[1] * ws[0] * ws[2]
        d_off[2] += g_dot_feat * signs[2] * ws[0] * ws[1]

    dpos_ref[...] += jnp.concatenate(d_off, axis=0) * scaling


# ---------------------------------------------------------------------------
# host-side wrappers
# ---------------------------------------------------------------------------


def _use_interpret() -> bool:
    return jax.devices()[0].platform != "tpu"


def _prep(table, positions, scalings, table_size):
    num_levels = scalings.shape[0]
    f = table.shape[-1]
    assert f == 2, "hash_gather kernel assumes features_per_level == 2"
    batch_shape = positions.shape[:-1]
    pos_t = positions.reshape(-1, 3).T.astype(jnp.float32)  # [3, N]
    n = pos_t.shape[1]
    qb = min(_FWD_QB, table_size)
    pad = (-n) % qb
    if pad:
        pos_t = jnp.pad(pos_t, ((0, 0), (0, pad)))
    # [L*T, F] -> [L, F, T]
    tab = jnp.transpose(
        table.reshape(num_levels, table_size, f), (0, 2, 1)
    ).astype(jnp.float32)
    scal = scalings.reshape(num_levels).astype(jnp.float32)
    return tab, pos_t, scal, n, qb, batch_shape, num_levels, f


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def hash_encode_dg(
    table: jax.Array,
    positions: jax.Array,
    scalings: jax.Array,
    table_size: int,
    compute_dtype=jnp.float32,
) -> jax.Array:
    """Drop-in for `ops.encodings.hash_encode` built on tpu.dynamic_gather.

    table: [L * table_size, F=2]; positions: [..., 3]; scalings: [L].
    Returns [..., L * F].
    """
    out, _ = _fwd(table, positions, scalings, table_size, compute_dtype)
    return out


def _fwd(table, positions, scalings, table_size, compute_dtype):
    tab, pos_t, scal, n, qb, batch_shape, L, f = _prep(
        table, positions, scalings, table_size
    )
    nb = pos_t.shape[1] // qb

    out = pl.pallas_call(
        functools.partial(_fwd_kernel, table_size=table_size),
        grid=(L, nb),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((3, qb), lambda l, b: (0, b)),
            pl.BlockSpec((1, 1, table_size), lambda l, b: (l, 0, 0)),
            pl.BlockSpec((1, 1, table_size), lambda l, b: (l, 1, 0)),
        ],
        out_specs=pl.BlockSpec((1, f, qb), lambda l, b: (l, 0, b)),
        out_shape=jax.ShapeDtypeStruct((L, f, pos_t.shape[1]), jnp.float32),
        interpret=_use_interpret(),
    )(scal, pos_t, tab, tab)

    out = out[:, :, :n]  # [L, F, N]
    out = jnp.transpose(out, (2, 0, 1)).reshape(*batch_shape, L * f)
    return out.astype(compute_dtype), (table, positions, scalings)


def _bwd(table_size, compute_dtype, res, g):
    table, positions, scalings = res
    tab, pos_t, scal, n, qb, batch_shape, L, f = _prep(
        table, positions, scalings, table_size
    )
    n_pad = pos_t.shape[1]

    # g: [..., L*F] -> [L, F, N] (padded tail contributes nothing: g = 0)
    g_t = jnp.transpose(g.reshape(-1, L, f).astype(jnp.float32), (1, 2, 0))
    if n_pad != n:
        g_t = jnp.pad(g_t, ((0, 0), (0, 0), (0, n_pad - n)))

    # -- table gradient: MXU two-level one-hot scatter
    tile = _BWD_TILE
    # pad queries up to the scatter tile
    pad2 = (-n_pad) % tile
    pos_s = jnp.pad(pos_t, ((0, 0), (0, pad2))) if pad2 else pos_t
    g_s = jnp.pad(g_t, ((0, 0), (0, 0), (0, pad2))) if pad2 else g_t
    nt = pos_s.shape[1] // tile
    a_sz = table_size // _LANES

    dtab = pl.pallas_call(
        functools.partial(_bwd_table_kernel, table_size=table_size),
        grid=(L, nt),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((3, tile), lambda l, t: (0, t)),
            pl.BlockSpec((1, f, tile), lambda l, t: (l, 0, t)),
        ],
        out_specs=pl.BlockSpec((1, f, a_sz, _LANES), lambda l, t: (l, 0, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((L, f, a_sz, _LANES), jnp.float32),
        interpret=_use_interpret(),
    )(scal, pos_s, g_s)
    # [L, F, A, 128] -> [L*T, F]
    d_table = jnp.transpose(dtab.reshape(L, f, table_size), (0, 2, 1)).reshape(
        L * table_size, f
    ).astype(table.dtype)

    # -- position gradient: re-gather features per corner
    nb = n_pad // qb
    dpos = pl.pallas_call(
        functools.partial(_bwd_pos_kernel, table_size=table_size),
        grid=(nb, L),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((3, qb), lambda b, l: (0, b)),
            pl.BlockSpec((1, 1, table_size), lambda b, l: (l, 0, 0)),
            pl.BlockSpec((1, 1, table_size), lambda b, l: (l, 1, 0)),
            pl.BlockSpec((1, f, qb), lambda b, l: (l, 0, b)),
        ],
        out_specs=pl.BlockSpec((3, qb), lambda b, l: (0, b)),
        out_shape=jax.ShapeDtypeStruct((3, n_pad), jnp.float32),
        interpret=_use_interpret(),
    )(scal, pos_t, tab, tab, g_t)

    d_positions = dpos[:, :n].T.reshape(*batch_shape, 3).astype(positions.dtype)
    return d_table, d_positions, jnp.zeros_like(scalings)


hash_encode_dg.defvjp(_fwd, _bwd)
