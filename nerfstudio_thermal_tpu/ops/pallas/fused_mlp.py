"""Fully-fused MLP Pallas kernel — the TPU equivalent of tiny-cuda-nn's
FullyFusedMLP (reference field_components/mlp.py:102-115).

Why: XLA materializes every layer's activations to HBM; at NeRF batch sizes
(~400k points x 256 wide) a single layer moves ~600 MB, making the field MLPs
bandwidth-bound (~1.1 ms/layer measured on v5e). This kernel runs the whole
stack per point-block inside VMEM: HBM traffic collapses to inputs + outputs
+ weights.

Forward: grid over point blocks; weights/biases live in VMEM across the whole
grid (constant index maps), activations ping-pong in registers/VMEM.
Backward (custom VJP): recomputes the block's activations in VMEM (storing
only the layer inputs per block), then accumulates dW/db across grid steps in
VMEM-resident output blocks (sequential TPU grid makes += safe), and emits dx.

All matmuls run on the MXU in the requested compute dtype with fp32
accumulation (preferred_element_type).
"""

import functools
import os
from typing import Callable, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from nerfstudio_thermal_tpu.ops.pallas.kernel_precision import dot_precision


def _freq_matrix(in_dim: int, num_freqs: int, min_exp: float, max_exp: float):
    """[in_dim, in_dim * F] selector: pre[n, d*F+k] = 2*pi*2^e_k * x[n, d].

    Expressing the frequency expansion as a matmul keeps the encoding on the
    MXU inside the kernel (a [blk,3]x[3,3F] dot is free) instead of a lane-1
    broadcast chain on the VPU. Semantics match ops.encodings.NeRFEncoding.
    Built from iotas (Pallas kernels cannot capture array constants).
    """
    rows = jax.lax.broadcasted_iota(jnp.int32, (in_dim, in_dim * num_freqs), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (in_dim, in_dim * num_freqs), 1)
    k = cols % num_freqs
    exps = min_exp + (max_exp - min_exp) * k.astype(jnp.float32) / max(
        num_freqs - 1, 1
    )
    freq = 2.0 * jnp.pi * jnp.exp2(exps)
    return jnp.where(cols // num_freqs == rows, freq, 0.0)


def _encode(x_f32, freq_encoding, in_dim):
    """In-kernel NeRF frequency encoding: [sin(pre), cos(pre) (, x)]."""
    num_freqs, min_exp, max_exp, include_input = freq_encoding
    e = jnp.asarray(_freq_matrix(in_dim, num_freqs, min_exp, max_exp))
    pre = jnp.dot(
        x_f32, e, preferred_element_type=jnp.float32,
        precision=dot_precision(x_f32, e),
    )
    parts = [jnp.sin(pre), jnp.cos(pre)]
    if include_input:
        parts.append(x_f32)
    return jnp.concatenate(parts, axis=-1), pre


def _encode_bwd(x_f32, pre, d_enc, freq_encoding, in_dim):
    """d_enc [blk, enc_dim] -> d_x [blk, in_dim]."""
    num_freqs, min_exp, max_exp, include_input = freq_encoding
    nf = in_dim * num_freqs
    e = jnp.asarray(_freq_matrix(in_dim, num_freqs, min_exp, max_exp))
    d_pre = d_enc[:, :nf] * jnp.cos(pre) - d_enc[:, nf : 2 * nf] * jnp.sin(pre)
    dx = jnp.dot(
        d_pre, e.T, preferred_element_type=jnp.float32,
        precision=dot_precision(d_pre, e),
    )
    if include_input:
        dx = dx + d_enc[:, 2 * nf :]
    return dx


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _apply_act(h, name: Optional[str]):
    if name is None:
        return h
    if name == "relu":
        return jnp.maximum(h, 0.0)
    if name == "sigmoid":
        return jax.nn.sigmoid(h)
    raise ValueError(f"unsupported activation {name}")


def _layer_pre(x0, h, w_ref, b_ref, li, skips):
    """Layer li's pre-activation (f32), skip-aware. With _SPLIT_SKIP the
    concat([x0, h]) @ W becomes x0 @ W_top + h @ W_bot: identical MXU work
    (the narrow encoding pads to a full 128 contraction tile either way)
    but no misaligned-lane concat on a [blk, in+width] buffer."""
    w = w_ref[:]
    if li in skips and li != 0:
        if _SPLIT_SKIP():
            in_dim = x0.shape[-1]
            pre = jnp.dot(
                x0, w[:in_dim], preferred_element_type=jnp.float32,
                precision=dot_precision(x0, w),
            ) + jnp.dot(
                h, w[in_dim:], preferred_element_type=jnp.float32,
                precision=dot_precision(h, w),
            )
            return pre + b_ref[:].astype(jnp.float32)
        h = jnp.concatenate([x0, h], axis=-1)
    return (
        jnp.dot(
            h, w, preferred_element_type=jnp.float32,
            precision=dot_precision(h, w),
        )
        + b_ref[:].astype(jnp.float32)
    )


def _INTERLEAVE() -> int:
    """Number of independent sub-blocks processed alternately per layer
    (1 = off). The layer-serialized [blk, W]@[W, W] chain leaves the MXU
    draining between dependent matmuls; k>1 interleaves k row-slices so
    each layer issues k independent dots the scheduler can overlap.
    Trace-time env read, same contract as the other kernel knobs."""
    try:
        return max(1, int(os.environ.get("NS_FMLP_INTERLEAVE", "1")))
    except ValueError:
        return 1


def _mlp_fwd_core(x0, w_refs, b_refs, num_layers, activation, out_activation, skips):
    """Forward MLP loop on an already-encoded VMEM block x0 (compute dtype)."""
    cdt = x0.dtype
    k = _INTERLEAVE()
    if k > 1 and x0.shape[0] % k == 0 and (x0.shape[0] // k) % 8 == 0:
        n = x0.shape[0] // k
        xs = [x0[j * n:(j + 1) * n] for j in range(k)]
        hs = list(xs)
        for li in range(num_layers):
            act = activation if li < num_layers - 1 else out_activation
            hs = [
                _apply_act(
                    _layer_pre(xs[j], hs[j], w_refs[li], b_refs[li], li, skips),
                    act,
                ).astype(cdt)
                for j in range(k)
            ]
        return jnp.concatenate(hs, axis=0)
    h = x0
    for li in range(num_layers):
        h = _layer_pre(x0, h, w_refs[li], b_refs[li], li, skips)
        if li < num_layers - 1:
            h = _apply_act(h, activation)
        else:
            h = _apply_act(h, out_activation)
        h = h.astype(cdt)
    return h


def _mlp_fwd_save(x0, w_refs, b_refs, num_layers, activation, out_activation, skips):
    """Forward pass that also returns the per-layer post-activations (compute
    dtype) and the final pre-activation (f32) needed by the backward."""
    cdt = x0.dtype
    k = _INTERLEAVE()
    if k > 1 and x0.shape[0] % k == 0 and (x0.shape[0] // k) % 8 == 0:
        n = x0.shape[0] // k
        xs = [x0[j * n:(j + 1) * n] for j in range(k)]
        hs = list(xs)
        post_acts = []
        final_pre = None
        for li in range(num_layers):
            pres = [
                _layer_pre(xs[j], hs[j], w_refs[li], b_refs[li], li, skips)
                for j in range(k)
            ]
            if li < num_layers - 1:
                hs = [_apply_act(p, activation).astype(cdt) for p in pres]
            else:
                final_pre = jnp.concatenate(pres, axis=0)
                hs = [_apply_act(p, out_activation).astype(cdt) for p in pres]
            post_acts.append(jnp.concatenate(hs, axis=0))
        return post_acts, final_pre
    h = x0
    post_acts = []  # activated output of each layer, compute dtype
    final_pre = None
    for li in range(num_layers):
        pre = _layer_pre(x0, h, w_refs[li], b_refs[li], li, skips)
        if li < num_layers - 1:
            h = _apply_act(pre, activation).astype(cdt)
        else:
            final_pre = pre
            h = _apply_act(pre, out_activation).astype(cdt)
        post_acts.append(h)
    return post_acts, final_pre


def _mlp_bwd_from_saved(
    x0, g, post_acts, final_pre, w_refs, b_refs, dw_refs, db_refs,
    num_layers, activation, out_activation, skips,
):
    """Backward from saved activations: accumulate dW/db into the
    VMEM-resident output refs, return d_x0 (f32). With _INTERLEAVE > 1 the
    block is split into k row-slices whose dependent dh chains are
    independent of each other — the dW/db `+=` accumulation makes slice
    walks composable, and the scheduler may overlap their matmuls."""
    k = _INTERLEAVE()
    if k > 1 and x0.shape[0] % k == 0 and (x0.shape[0] // k) % 8 == 0:
        n = x0.shape[0] // k

        def _slc(a, j):  # post_acts may end in None; final_pre may be None
            return None if a is None else a[j * n:(j + 1) * n]

        dxs = [
            _mlp_bwd_walk(
                _slc(x0, j), _slc(g, j),
                [_slc(a, j) for a in post_acts],
                _slc(final_pre, j),
                w_refs, b_refs, dw_refs, db_refs,
                num_layers, activation, out_activation, skips,
            )
            for j in range(k)
        ]
        return jnp.concatenate(dxs, axis=0)
    return _mlp_bwd_walk(
        x0, g, post_acts, final_pre, w_refs, b_refs, dw_refs, db_refs,
        num_layers, activation, out_activation, skips,
    )


def _mlp_bwd_walk(
    x0, g, post_acts, final_pre, w_refs, b_refs, dw_refs, db_refs,
    num_layers, activation, out_activation, skips,
):
    """One reverse layer walk over a row-slice (see _mlp_bwd_from_saved)."""
    cdt = x0.dtype
    in_dim = x0.shape[-1]
    split = _SPLIT_SKIP()

    dx_accum = jnp.zeros_like(x0, dtype=jnp.float32)
    dh = g.astype(jnp.float32)
    if out_activation == "sigmoid":
        y = jax.nn.sigmoid(final_pre)
        dh = dh * y * (1.0 - y)
    for li in reversed(range(num_layers)):
        if li < num_layers - 1 and activation == "relu":
            # f32 compare: sub-word comparisons are unsupported by Mosaic
            dh = dh * (post_acts[li].astype(jnp.float32) > 0.0)
        h_prev = x0 if li == 0 else post_acts[li - 1]
        dhc = dh.astype(cdt)
        db_refs[li][:] += jnp.sum(dh, axis=0, keepdims=True)
        is_skip = li in skips and li != 0
        if is_skip and split:
            # dW as two batch-contracting dots + a weight-sized concat; dh
            # split as two dots against the weight halves — no [blk, in+w]
            # misaligned buffers anywhere
            w = w_refs[li][:]
            dw_top = jax.lax.dot_general(
                x0.astype(cdt), dhc, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=dot_precision(x0, dhc),
            )
            dw_bot = jax.lax.dot_general(
                h_prev.astype(cdt), dhc, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=dot_precision(h_prev, dhc),
            )
            dw_refs[li][:] += jnp.concatenate([dw_top, dw_bot], axis=0)
            dx_accum = dx_accum + jnp.dot(
                dhc, w[:in_dim].T, preferred_element_type=jnp.float32,
                precision=dot_precision(dhc, w),
            )
            dh = jnp.dot(
                dhc, w[in_dim:].T, preferred_element_type=jnp.float32,
                precision=dot_precision(dhc, w),
            )
        else:
            x_in = (
                jnp.concatenate([x0, h_prev], axis=-1) if is_skip else h_prev
            ).astype(cdt)
            # batch-contracting dot_general == x_in.T @ dhc without asking
            # Mosaic to materialize a [width, blk] transpose first
            dw_refs[li][:] += jax.lax.dot_general(
                x_in, dhc, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=dot_precision(x_in, dhc),
            )
            dh = jnp.dot(
                dhc, w_refs[li][:].T, preferred_element_type=jnp.float32,
                precision=dot_precision(dhc, w_refs[li]),
            )
            if is_skip:
                # layer input was concat([x0, h_prev]); split the gradient
                dx_accum = dx_accum + dh[:, :in_dim]
                dh = dh[:, in_dim:]
        if li == 0:
            dx_accum = dx_accum + dh
    return dx_accum


def _mlp_bwd_core(
    x0, g, w_refs, b_refs, dw_refs, db_refs,
    num_layers, activation, out_activation, skips,
):
    """Recompute forward from encoded block x0, accumulate dW/db into the
    VMEM-resident output refs, and return d_x0 (f32, w.r.t. the encoded
    input)."""
    post_acts, final_pre = _mlp_fwd_save(
        x0, w_refs, b_refs, num_layers, activation, out_activation, skips
    )
    return _mlp_bwd_from_saved(
        x0, g, post_acts, final_pre, w_refs, b_refs, dw_refs, db_refs,
        num_layers, activation, out_activation, skips,
    )


def _fwd_kernel(num_layers, activation, out_activation, skips, freq_encoding, refs):
    x_ref = refs[0]
    w_refs = refs[1 : 1 + num_layers]
    b_refs = refs[1 + num_layers : 1 + 2 * num_layers]
    out_ref = refs[1 + 2 * num_layers]

    cdt = w_refs[0].dtype
    if freq_encoding is not None:
        enc, _ = _encode(x_ref[:].astype(jnp.float32), freq_encoding, x_ref.shape[-1])
        x0 = enc.astype(cdt)
    else:
        x0 = x_ref[:].astype(cdt)
    h = _mlp_fwd_core(x0, w_refs, b_refs, num_layers, activation, out_activation, skips)
    out_ref[:] = h.astype(out_ref.dtype)


def _fwd_save_kernel(
    num_layers, activation, out_activation, skips, freq_encoding, refs
):
    """Forward that also streams the hidden post-activations (layers
    0..n-2) to HBM so the backward can skip the full forward recompute —
    trading ~1/3 of the backward kernel's MXU work for HBM traffic that
    overlaps compute (refs: x, w*, b*, out, act*)."""
    x_ref = refs[0]
    w_refs = refs[1 : 1 + num_layers]
    b_refs = refs[1 + num_layers : 1 + 2 * num_layers]
    out_ref = refs[1 + 2 * num_layers]
    act_refs = refs[2 + 2 * num_layers :]

    cdt = w_refs[0].dtype
    if freq_encoding is not None:
        enc, _ = _encode(x_ref[:].astype(jnp.float32), freq_encoding, x_ref.shape[-1])
        x0 = enc.astype(cdt)
    else:
        x0 = x_ref[:].astype(cdt)
    post_acts, _ = _mlp_fwd_save(
        x0, w_refs, b_refs, num_layers, activation, out_activation, skips
    )
    for li in range(num_layers - 1):
        act_refs[li][:] = post_acts[li]
    out_ref[:] = post_acts[-1].astype(out_ref.dtype)


def _bwd_saved_kernel(
    num_layers, activation, out_activation, skips, freq_encoding, refs
):
    """Backward from streamed activations: no forward recompute (only the
    cheap in-kernel encoding, one [blk, in_dim] matmul + sin/cos, and — for
    a sigmoid head — the final layer's pre-activation). Refs layout:
    inputs (x, g, act0..act{n-2}, w0..wn, b0..bn) then outputs
    (dx, dw0..n, db0..n)."""
    n = num_layers
    x_ref = refs[0]
    g_ref = refs[1]
    act_refs = refs[2 : 1 + n]  # n-1 hidden activations
    w_refs = refs[1 + n : 1 + 2 * n]
    b_refs = refs[1 + 2 * n : 1 + 3 * n]
    dx_ref = refs[1 + 3 * n]
    dw_refs = refs[2 + 3 * n : 2 + 4 * n]
    db_refs = refs[2 + 4 * n : 2 + 5 * n]

    step = pl.program_id(0)

    @pl.when(step == 0)
    def _init():
        for li in range(num_layers):
            dw_refs[li][:] = jnp.zeros_like(dw_refs[li])
            db_refs[li][:] = jnp.zeros_like(db_refs[li])

    cdt = w_refs[0].dtype
    if freq_encoding is not None:
        raw = x_ref[:].astype(jnp.float32)
        enc, pre_enc = _encode(raw, freq_encoding, x_ref.shape[-1])
        x0 = enc.astype(cdt)
    else:
        x0 = x_ref[:].astype(cdt)
    # the last layer's post-activation is only consumed by the relu mask
    # (never taken for li == n-1) and, via final_pre, by a sigmoid head —
    # reconstruct the latter with a single matmul instead of streaming it
    post_acts = [a[:] for a in act_refs] + [None]
    final_pre = None
    if out_activation == "sigmoid":
        h_last = post_acts[n - 2] if n > 1 else x0
        final_pre = _layer_pre(
            x0, h_last, w_refs[n - 1], b_refs[n - 1], n - 1, skips
        )
    dx_accum = _mlp_bwd_from_saved(
        x0, g_ref[:], post_acts, final_pre, w_refs, b_refs, dw_refs, db_refs,
        num_layers, activation, out_activation, skips,
    )
    if freq_encoding is not None:
        dx_accum = _encode_bwd(raw, pre_enc, dx_accum, freq_encoding, x_ref.shape[-1])
    dx_ref[:] = dx_accum.astype(dx_ref.dtype)


def _bwd_kernel(num_layers, activation, out_activation, skips, freq_encoding, refs):
    # refs = inputs (x, g, w0..wn, b0..bn) then outputs (dx, dw0..n, db0..n)
    n = num_layers
    x_ref = refs[0]
    g_ref = refs[1]
    w_refs = refs[2 : 2 + n]
    b_refs = refs[2 + n : 2 + 2 * n]
    dx_ref = refs[2 + 2 * n]
    dw_refs = refs[3 + 2 * n : 3 + 3 * n]
    db_refs = refs[3 + 3 * n : 3 + 4 * n]

    step = pl.program_id(0)

    @pl.when(step == 0)
    def _init():
        for li in range(num_layers):
            dw_refs[li][:] = jnp.zeros_like(dw_refs[li])
            db_refs[li][:] = jnp.zeros_like(db_refs[li])

    # Recompute forward, storing only bf16 post-activations (the relu mask is
    # recoverable as h > 0; keeping f32 pre-activations would overflow VMEM).
    cdt = w_refs[0].dtype
    if freq_encoding is not None:
        raw = x_ref[:].astype(jnp.float32)
        enc, pre_enc = _encode(raw, freq_encoding, x_ref.shape[-1])
        x0 = enc.astype(cdt)
    else:
        x0 = x_ref[:].astype(cdt)
    dx_accum = _mlp_bwd_core(
        x0, g_ref[:], w_refs, b_refs, dw_refs, db_refs,
        num_layers, activation, out_activation, skips,
    )
    if freq_encoding is not None:
        dx_accum = _encode_bwd(raw, pre_enc, dx_accum, freq_encoding, x_ref.shape[-1])
    dx_ref[:] = dx_accum.astype(dx_ref.dtype)


def _pad_batch(x, blk):
    n = x.shape[0]
    pad = (-n) % blk
    if pad:
        x = jnp.concatenate([x, jnp.zeros((pad, x.shape[1]), x.dtype)], axis=0)
    return x, n


def _SAVE_ACTS() -> bool:
    """Trade the backward kernel's full forward recompute (1/3 of its MXU
    work) for streaming the forward's hidden activations through HBM.
    Read at trace time by the VJP forward only — the backward keys off the
    residuals, so a traced fwd/bwd pair can never disagree. Flipped
    per-subprocess by the bench autotune candidates."""
    return os.environ.get("NS_FMLP_SAVE_ACTS", "0") == "1"


def _SPLIT_SKIP() -> bool:
    """Compute skip layers as two matmuls (x0 @ W_top + h @ W_bot) instead
    of concat([x0, h]) @ W. The concat writes a [blk, in+width] buffer whose
    misaligned lane offset (e.g. 63 for the 8x256+enc base stack) costs
    cross-lane shuffles on every [blk, *] tensor it touches — forward
    concat, backward recompute concat, and the dh/dx gradient slices. The
    split form moves every misaligned op onto weight-sized tensors. MXU
    work is identical (63 pads to a 128 contraction tile either way).
    Trace-time read; same value seen by fwd and bwd of one trace."""
    return os.environ.get("NS_FMLP_SPLIT_SKIP", "0") == "1"


@functools.partial(
    jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6, 7, 8, 9)
)
def fused_mlp(
    x: jax.Array,  # [N, in_dim]
    weights: Tuple[jax.Array, ...],  # per layer [din, dout]
    biases: Tuple[jax.Array, ...],  # per layer [dout]
    activation: str = "relu",
    out_activation: Optional[str] = None,
    block_size: int = 2048,
    interpret: bool = False,
    skip_connections: Tuple[int, ...] = (),
    freq_encoding: Optional[Tuple[int, float, float, bool]] = None,
    compute_dtype: Optional[str] = None,
) -> jax.Array:
    """Run the whole MLP stack in one Pallas kernel. Returns [N, out_dim].

    skip_connections: layer indices whose input is concat([x, h]) (classic
    NeRF skip), matching ops.mlp.MLP semantics.

    freq_encoding: optional (num_frequencies, min_exp, max_exp,
    include_input). When set, x is raw coordinates [N, in_dim] (keep them
    f32!) and the NeRF frequency encoding (ops.encodings.NeRFEncoding
    semantics) is computed inside the kernel — the tcnn
    NetworkWithInputEncoding analogue (reference field_components/mlp.py:186):
    the [N, enc_dim] encoding never exists in HBM, and skip connections
    concatenate the encoding (matching the unfused path, whose MLP input is
    the encoding)."""
    return _fused_mlp_fwd_impl(
        x, weights, biases, activation, out_activation, block_size, interpret,
        skip_connections, freq_encoding, compute_dtype,
    )


def _fused_mlp_fwd_impl(x, weights, biases, activation, out_activation, block_size, interpret, skips=(), freq_encoding=None, compute_dtype=None, save_acts=False):
    num_layers = len(weights)
    out_dim = weights[-1].shape[-1]
    dtype = jnp.dtype(compute_dtype) if compute_dtype is not None else x.dtype
    act_bytes = 2 if dtype == jnp.bfloat16 else 4
    # fwd VMEM: f32 pre-activations [blk, width] + bf16 h + encoding temps
    width = max(w.shape[-1] for w in weights)
    per_point = width * 6
    if freq_encoding is not None:
        per_point += 4 * 1024  # lane-padded f32 encoding temps (see bwd)
    if save_acts:
        # hidden activations become double-buffered output windows
        per_point += 2 * act_bytes * sum(w.shape[-1] for w in weights[:-1])
    # fwd VMEM budget (MB): at the default 24 the save-acts base stack runs
    # blk 1536, plain runs blk 2048 (the request cap); env-swept like the
    # bwd budget — trace-time read, per-subprocess in the bench autotune
    fwd_budget = int(os.environ.get("NS_FMLP_FWD_BUDGET_MB", "24")) * 2**20
    block_size = min(
        block_size, max(512, fwd_budget // max(per_point, 1) // 512 * 512),
        4096,  # blk 8192 crashes the v5e remote compiler (HTTP 500, r5 sweep)
    )
    xp, n = _pad_batch(x, block_size)
    npad = xp.shape[0]

    w_cast = [w.astype(dtype) for w in weights]
    b_cast = [b.reshape(1, -1).astype(dtype) for b in biases]

    kernel_fn = _fwd_save_kernel if save_acts else _fwd_kernel
    kernel = functools.partial(
        lambda *refs: kernel_fn(
            num_layers, activation, out_activation, tuple(skips),
            freq_encoding, refs,
        )
    )
    in_specs = [
        pl.BlockSpec((block_size, xp.shape[1]), lambda i: (i, 0), memory_space=pltpu.VMEM)
    ]
    for w in w_cast:
        in_specs.append(
            pl.BlockSpec(w.shape, lambda i: (0, 0), memory_space=pltpu.VMEM)
        )
    for b in b_cast:
        in_specs.append(
            pl.BlockSpec(b.shape, lambda i: (0, 0), memory_space=pltpu.VMEM)
        )
    out_specs = pl.BlockSpec(
        (block_size, out_dim), lambda i: (i, 0), memory_space=pltpu.VMEM
    )
    out_shape = jax.ShapeDtypeStruct((npad, out_dim), dtype)
    if save_acts:
        out_specs = [out_specs] + [
            pl.BlockSpec(
                (block_size, w.shape[-1]), lambda i: (i, 0),
                memory_space=pltpu.VMEM,
            )
            for w in w_cast[:-1]
        ]
        out_shape = [out_shape] + [
            jax.ShapeDtypeStruct((npad, w.shape[-1]), dtype)
            for w in w_cast[:-1]
        ]
    out = pl.pallas_call(
        kernel,
        grid=(npad // block_size,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=interpret,
        # parallel: point blocks are independent -> Mosaic may pipeline the
        # per-block input DMA against compute across grid steps
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 2**20,
            dimension_semantics=("parallel",),
        ),
    )(xp, *w_cast, *b_cast)
    if save_acts:
        # activations stay PADDED (the bwd re-pads to its own block size)
        return out[0][:n], list(out[1:])
    return out[:n]


def _fused_mlp_fwd(x, weights, biases, activation, out_activation, block_size, interpret, skip_connections=(), freq_encoding=None, compute_dtype=None):
    if _SAVE_ACTS():
        out, acts = _fused_mlp_fwd_impl(
            x, weights, biases, activation, out_activation, block_size,
            interpret, skip_connections, freq_encoding, compute_dtype,
            save_acts=True,
        )
        return out, (x, weights, biases, tuple(acts))
    out = _fused_mlp_fwd_impl(
        x, weights, biases, activation, out_activation, block_size, interpret,
        skip_connections, freq_encoding, compute_dtype,
    )
    return out, (x, weights, biases, None)


def _fused_mlp_bwd(activation, out_activation, block_size, interpret, skip_connections, freq_encoding, compute_dtype, res, g):
    x, weights, biases, acts = res
    num_layers = len(weights)
    dtype = jnp.dtype(compute_dtype) if compute_dtype is not None else x.dtype
    # The bwd kernel holds per-layer activations in VMEM; shrink the block so
    # num_layers * block * width activations stay well under the 16 MB limit.
    width = max(w.shape[-1] for w in weights)
    act_bytes = 2 if dtype == jnp.bfloat16 else 4
    per_point = num_layers * width * act_bytes
    if acts is not None:
        # streamed activations are double-buffered input windows on top of
        # the VMEM-resident values the backward walk holds anyway
        per_point += act_bytes * sum(a.shape[-1] for a in acts)
    if freq_encoding is not None:
        # In-kernel encoding recompute keeps ~a dozen [blk, <=128-lane] f32
        # temps alive (raw, pre, sin, cos, d_enc slices, dx); every narrow
        # vector pads its lane dim to 128, so the cost is ~flat in F
        # (measured 4.8-7.8 KB/point on v5e for F=7..10).
        per_point += 8 * 1024
    # activations get ~1/3 of VMEM: weights + f32 dh/dw/dx + in/out blocks
    # share the rest (measured: 5 MB fits for 8x256 stacks)
    budget = int(os.environ.get("NS_FMLP_BWD_BUDGET_MB", "5")) * 1024 * 1024
    block_size = min(
        block_size,
        max(512, budget // max(per_point, 1) // 512 * 512),
    )
    xp, n = _pad_batch(x, block_size)
    gp, _ = _pad_batch(g.astype(dtype), block_size)
    # dx has the raw-coordinate width when the encoding runs in-kernel
    npad = xp.shape[0]

    w_cast = [w.astype(dtype) for w in weights]
    b_cast = [b.reshape(1, -1).astype(dtype) for b in biases]
    acts_p = (
        [_pad_batch(a, block_size)[0] for a in acts] if acts is not None else []
    )

    kernel_fn = _bwd_saved_kernel if acts is not None else _bwd_kernel
    kernel = functools.partial(
        lambda *refs: kernel_fn(
            num_layers, activation, out_activation, tuple(skip_connections),
            freq_encoding, refs,
        )
    )
    in_specs = [
        pl.BlockSpec((block_size, xp.shape[1]), lambda i: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((block_size, gp.shape[1]), lambda i: (i, 0), memory_space=pltpu.VMEM),
    ]
    for a in acts_p:
        in_specs.append(
            pl.BlockSpec((block_size, a.shape[1]), lambda i: (i, 0), memory_space=pltpu.VMEM)
        )
    for w in w_cast:
        in_specs.append(pl.BlockSpec(w.shape, lambda i: (0, 0), memory_space=pltpu.VMEM))
    for b in b_cast:
        in_specs.append(pl.BlockSpec(b.shape, lambda i: (0, 0), memory_space=pltpu.VMEM))

    dx_dtype = jnp.float32 if freq_encoding is not None else dtype
    out_shapes = [jax.ShapeDtypeStruct((npad, xp.shape[1]), dx_dtype)]
    out_specs = [
        pl.BlockSpec((block_size, xp.shape[1]), lambda i: (i, 0), memory_space=pltpu.VMEM)
    ]
    for w in weights:
        out_shapes.append(jax.ShapeDtypeStruct(w.shape, jnp.float32))
        out_specs.append(pl.BlockSpec(w.shape, lambda i: (0, 0), memory_space=pltpu.VMEM))
    for b in biases:
        out_shapes.append(jax.ShapeDtypeStruct((1, b.shape[-1]), jnp.float32))
        out_specs.append(
            pl.BlockSpec((1, b.shape[-1]), lambda i: (0, 0), memory_space=pltpu.VMEM)
        )

    outs = pl.pallas_call(
        kernel,
        grid=(npad // block_size,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shapes,
        interpret=interpret,
        # arbitrary (sequential): the dw/db += accumulation across grid
        # steps requires in-order execution
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 2**20,
            dimension_semantics=("arbitrary",),
        ),
    )(xp, gp, *acts_p, *w_cast, *b_cast)

    dx = outs[0][:n].astype(x.dtype)
    dws = tuple(
        dw.astype(w.dtype) for dw, w in zip(outs[1 : 1 + num_layers], weights)
    )
    dbs = tuple(
        db.reshape(b.shape).astype(b.dtype)
        for db, b in zip(outs[1 + num_layers :], biases)
    )
    return dx, dws, dbs


fused_mlp.defvjp(_fused_mlp_fwd, _fused_mlp_bwd)


# ---------------------------------------------------------------------------
# Fused ray-march: positions + scene contraction + encoding + MLP in VMEM.
#
# The XLA train step spends ~4 ms/step (v5e trace, tools/xla_trace_bench.py)
# on base-field position machinery alone: `o + t*d` broadcasts into
# [R, S, 3] tensors (3 useful lanes of 128), scene-contraction fwd/bwd
# fusions, and layout copies feeding the MLP kernel. Taking (origins, dirs,
# midpoints) instead of positions moves all of it into the kernel: the
# per-sample position tensor never exists in HBM, and the per-ray -> per-
# sample expansion is an iota-built one-hot matmul that rides the MXU in
# both directions (the XLA broadcast's VJP is a narrow-lane reduction).
# This is the TPU analogue of a fused ray-march (SURVEY.md §7.2 step 8);
# the tcnn role it replaces is reference field_components/mlp.py:250-268.
# ---------------------------------------------------------------------------


def _rep_matrix(n: int, r: int, s: int):
    """[n, r] one-hot row-repeat selector: rep[i, j] = 1 iff i // s == j."""
    rows = jax.lax.broadcasted_iota(jnp.int32, (n, r), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (n, r), 1)
    return (rows // s == cols).astype(jnp.float32)


def _posgen_fwd(o, d, t, num_samples):
    """o, d [r, 3] f32; t [r*S, 1] f32 -> (pos [r*S, 3], d_rep, rep)."""
    r = o.shape[0]
    rep = _rep_matrix(r * num_samples, r, num_samples)
    o_rep = jnp.dot(
        rep, o, preferred_element_type=jnp.float32,
        precision=dot_precision(rep, o),
    )
    d_rep = jnp.dot(
        rep, d, preferred_element_type=jnp.float32,
        precision=dot_precision(rep, d),
    )
    return o_rep + t * d_rep, d_rep, rep


def _contract_fwd(pos):
    """MipNeRF-360 contraction (order=inf) + (x+2)/4 + in-(0,1)^3 selector,
    matching fields' `_normalize_positions` (ops/spatial_distortions.py)."""
    mag = jnp.max(jnp.abs(pos), axis=-1, keepdims=True)
    safe = jnp.maximum(mag, 1e-12)
    contracted = (2.0 - 1.0 / safe) * (pos / safe)
    cpos = jnp.where(mag < 1.0, pos, contracted)
    p01 = (cpos + 2.0) * 0.25
    inb = jnp.logical_and(p01 > 0.0, p01 < 1.0).astype(jnp.float32)
    sel = jnp.min(inb, axis=-1, keepdims=True)
    return p01 * sel, sel, mag, safe


def _contract_bwd(dx, pos, sel, mag, safe):
    """VJP of `_contract_fwd`'s position output w.r.t. pos. The selector is
    piecewise-constant (zero gradient), matching the XLA path where it is a
    boolean mask."""
    g = dx * sel * 0.25  # through p01 = (c + 2)/4 and x = p01 * sel
    m = safe
    gdotx = jnp.sum(g * pos, axis=-1, keepdims=True)
    s = jnp.sign(pos) * (jnp.abs(pos) >= mag).astype(jnp.float32)
    d_contracted = g * (2.0 / m - 1.0 / (m * m)) + gdotx * (
        2.0 / (m * m * m) - 2.0 / (m * m)
    ) * s
    return jnp.where(mag < 1.0, g, d_contracted)


def _ray_fwd_kernel(
    num_layers, activation, out_activation, skips, freq_encoding, num_samples, refs
):
    o_ref, d_ref, t_ref = refs[0], refs[1], refs[2]
    w_refs = refs[3 : 3 + num_layers]
    b_refs = refs[3 + num_layers : 3 + 2 * num_layers]
    out_ref = refs[3 + 2 * num_layers]

    cdt = w_refs[0].dtype
    pos, _, _ = _posgen_fwd(
        o_ref[:].astype(jnp.float32), d_ref[:].astype(jnp.float32),
        t_ref[:].astype(jnp.float32), num_samples,
    )
    x, sel, _, _ = _contract_fwd(pos)
    enc, _ = _encode(x, freq_encoding, 3)
    h = _mlp_fwd_core(
        enc.astype(cdt), w_refs, b_refs, num_layers, activation, out_activation, skips
    )
    out_ref[:] = jnp.concatenate(
        [h.astype(out_ref.dtype), sel.astype(out_ref.dtype)], axis=-1
    )


def _ray_bwd_kernel(
    num_layers, activation, out_activation, skips, freq_encoding, num_samples,
    out_dim, need_input_grads, refs,
):
    n = num_layers
    o_ref, d_ref, t_ref, g_ref = refs[0], refs[1], refs[2], refs[3]
    w_refs = refs[4 : 4 + n]
    b_refs = refs[4 + n : 4 + 2 * n]
    k = 3 if need_input_grads else 0
    if need_input_grads:
        do_ref, dd_ref, dt_ref = refs[4 + 2 * n : 7 + 2 * n]
    dw_refs = refs[4 + k + 2 * n : 4 + k + 3 * n]
    db_refs = refs[4 + k + 3 * n : 4 + k + 4 * n]

    step = pl.program_id(0)

    @pl.when(step == 0)
    def _init():
        for li in range(num_layers):
            dw_refs[li][:] = jnp.zeros_like(dw_refs[li])
            db_refs[li][:] = jnp.zeros_like(db_refs[li])

    cdt = w_refs[0].dtype
    t = t_ref[:].astype(jnp.float32)
    pos, d_rep, rep = _posgen_fwd(
        o_ref[:].astype(jnp.float32), d_ref[:].astype(jnp.float32), t, num_samples
    )
    x, sel, mag, safe = _contract_fwd(pos)
    enc, pre_enc = _encode(x, freq_encoding, 3)

    d_enc = _mlp_bwd_core(
        enc.astype(cdt), g_ref[:, :out_dim], w_refs, b_refs, dw_refs, db_refs,
        num_layers, activation, out_activation, skips,
    )
    if not need_input_grads:
        # Proposal fields with proposal_camera_gradients=False: the caller
        # stop-gradients (o, d, t), so the whole input-grad chain (encoding
        # backward, contraction VJP, posgen transposes) is dead weight.
        return
    dx = _encode_bwd(x, pre_enc, d_enc, freq_encoding, 3)
    d_pos = _contract_bwd(dx, pos, sel, mag, safe)
    # pos = rep@o + t * (rep@d): transpose the selector matmuls back
    do_ref[:] = jax.lax.dot_general(
        rep, d_pos, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=dot_precision(rep, d_pos),
    )
    dd_ref[:] = jax.lax.dot_general(
        rep, d_pos * t, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=dot_precision(rep, d_pos),
    )
    dt_ref[:] = jnp.sum(d_pos * d_rep, axis=-1, keepdims=True)


def _resolve_ray_blocks(block_size, num_samples, num_layers, width, dtype, bwd):
    """Block sizing for the ray kernels: blk points = blk_r rays * S samples,
    bounded by the same VMEM budgets as the point kernels plus the padded
    narrow-lane position temps (~[blk, 128] f32 each) and the [blk, blk_r]
    repeat selector."""
    act_bytes = 2 if dtype == jnp.bfloat16 else 4
    if bwd:
        per_point = num_layers * width * act_bytes + 8 * 1024
        import os

        # Larger default than the point-kernel's 5 MB: ray-mode backward
        # grids are sequential ("arbitrary" for the dW accumulation), so
        # small blocks at large S mean hundreds of tiny unpipelined steps.
        budget = int(os.environ.get("NS_FRAY_BWD_BUDGET_MB", "32")) * 1024 * 1024
    else:
        per_point = width * 6 + 4 * 1024
        budget = 24 * 2**20
    per_point += 12 * 512  # posgen/contraction temps, lane-padded f32
    blk = min(block_size, max(512, budget // max(per_point, 1) // 512 * 512))
    # Mosaic requires the sublane dim of the [blk_r, 3] origin/dir blocks to
    # be a multiple of 8 (the f32 tile height).
    blk_r = max(8, blk // num_samples // 8 * 8)
    return blk_r * num_samples, blk_r


def _pad_rays(origins, dirs, ts, num_samples, blk_r):
    r = origins.shape[0]
    pad = (-r) % blk_r
    if pad:
        origins = jnp.concatenate(
            [origins, jnp.zeros((pad, 3), origins.dtype)], axis=0
        )
        dirs = jnp.concatenate([dirs, jnp.zeros((pad, 3), dirs.dtype)], axis=0)
        ts = jnp.concatenate(
            [ts, jnp.zeros((pad * num_samples, 1), ts.dtype)], axis=0
        )
    return origins, dirs, ts, r


@functools.partial(
    jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8, 9, 10, 11, 12, 13)
)
def fused_ray_mlp(
    origins: jax.Array,  # [R, 3] f32 world-space ray origins
    dirs: jax.Array,  # [R, 3] f32 ray directions
    ts: jax.Array,  # [R * S, 1] f32 sample midpoints (row-major per ray)
    weights: Tuple[jax.Array, ...],
    biases: Tuple[jax.Array, ...],
    num_samples: int,
    activation: str = "relu",
    out_activation: Optional[str] = None,
    block_size: int = 2048,
    interpret: bool = False,
    skip_connections: Tuple[int, ...] = (),
    freq_encoding: Tuple[int, float, float, bool] = (10, 0.0, 9.0, True),
    compute_dtype: Optional[str] = None,
    need_input_grads: bool = True,
) -> jax.Array:
    """Fused ray-march field evaluation. Returns [R * S, out_dim + 1]: the MLP
    outputs plus a final in-scene selector lane (0/1), so callers can apply
    the reference's `density * selector` zeroing without the positions ever
    existing in HBM. Position generation (o + t*d), MipNeRF-360 inf-norm
    contraction with (x+2)/4 rescale and selector zeroing (the fields'
    `_normalize_positions`), frequency encoding, and the MLP stack all run
    per-block in VMEM."""
    return _fused_ray_fwd_impl(
        origins, dirs, ts, weights, biases, num_samples, activation,
        out_activation, block_size, interpret, skip_connections, freq_encoding,
        compute_dtype,
    )


def _fused_ray_fwd_impl(
    origins, dirs, ts, weights, biases, num_samples, activation, out_activation,
    block_size, interpret, skips, freq_encoding, compute_dtype,
):
    num_layers = len(weights)
    out_dim = weights[-1].shape[-1]
    dtype = jnp.dtype(compute_dtype) if compute_dtype is not None else jnp.float32
    width = max(w.shape[-1] for w in weights)
    blk, blk_r = _resolve_ray_blocks(
        block_size, num_samples, num_layers, width, dtype, bwd=False
    )
    op, dp, tp, r = _pad_rays(origins, dirs, ts, num_samples, blk_r)
    grid = op.shape[0] // blk_r

    w_cast = [w.astype(dtype) for w in weights]
    b_cast = [b.reshape(1, -1).astype(dtype) for b in biases]

    kernel = functools.partial(
        lambda *refs: _ray_fwd_kernel(
            num_layers, activation, out_activation, tuple(skips), freq_encoding,
            num_samples, refs,
        )
    )
    in_specs = [
        pl.BlockSpec((blk_r, 3), lambda i: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((blk_r, 3), lambda i: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((blk, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
    ]
    for w in w_cast:
        in_specs.append(pl.BlockSpec(w.shape, lambda i: (0, 0), memory_space=pltpu.VMEM))
    for b in b_cast:
        in_specs.append(pl.BlockSpec(b.shape, lambda i: (0, 0), memory_space=pltpu.VMEM))
    out = pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (blk, out_dim + 1), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((op.shape[0] * num_samples, out_dim + 1), dtype),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 2**20,
            dimension_semantics=("parallel",),
        ),
    )(op, dp, tp, *w_cast, *b_cast)
    return out[: r * num_samples]


def _fused_ray_fwd(
    origins, dirs, ts, weights, biases, num_samples, activation, out_activation,
    block_size, interpret, skip_connections, freq_encoding, compute_dtype,
    need_input_grads,
):
    out = _fused_ray_fwd_impl(
        origins, dirs, ts, weights, biases, num_samples, activation,
        out_activation, block_size, interpret, skip_connections, freq_encoding,
        compute_dtype,
    )
    return out, (origins, dirs, ts, weights, biases)


def _fused_ray_bwd(
    num_samples, activation, out_activation, block_size, interpret,
    skip_connections, freq_encoding, compute_dtype, need_input_grads, res, g,
):
    origins, dirs, ts, weights, biases = res
    num_layers = len(weights)
    out_dim = weights[-1].shape[-1]
    dtype = jnp.dtype(compute_dtype) if compute_dtype is not None else jnp.float32
    width = max(w.shape[-1] for w in weights)
    blk, blk_r = _resolve_ray_blocks(
        block_size, num_samples, num_layers, width, dtype, bwd=True
    )
    op, dp, tp, r = _pad_rays(origins, dirs, ts, num_samples, blk_r)
    gp, _ = _pad_batch(g.astype(dtype), blk)
    grid = op.shape[0] // blk_r

    w_cast = [w.astype(dtype) for w in weights]
    b_cast = [b.reshape(1, -1).astype(dtype) for b in biases]

    kernel = functools.partial(
        lambda *refs: _ray_bwd_kernel(
            num_layers, activation, out_activation, tuple(skip_connections),
            freq_encoding, num_samples, out_dim, need_input_grads, refs,
        )
    )
    in_specs = [
        pl.BlockSpec((blk_r, 3), lambda i: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((blk_r, 3), lambda i: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((blk, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((blk, out_dim + 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
    ]
    for w in w_cast:
        in_specs.append(pl.BlockSpec(w.shape, lambda i: (0, 0), memory_space=pltpu.VMEM))
    for b in b_cast:
        in_specs.append(pl.BlockSpec(b.shape, lambda i: (0, 0), memory_space=pltpu.VMEM))

    if need_input_grads:
        out_shapes = [
            jax.ShapeDtypeStruct((op.shape[0], 3), jnp.float32),
            jax.ShapeDtypeStruct((op.shape[0], 3), jnp.float32),
            jax.ShapeDtypeStruct((op.shape[0] * num_samples, 1), jnp.float32),
        ]
        out_specs = [
            pl.BlockSpec((blk_r, 3), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((blk_r, 3), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((blk, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ]
    else:
        out_shapes, out_specs = [], []
    for w in weights:
        out_shapes.append(jax.ShapeDtypeStruct(w.shape, jnp.float32))
        out_specs.append(pl.BlockSpec(w.shape, lambda i: (0, 0), memory_space=pltpu.VMEM))
    for b in biases:
        out_shapes.append(jax.ShapeDtypeStruct((1, b.shape[-1]), jnp.float32))
        out_specs.append(
            pl.BlockSpec((1, b.shape[-1]), lambda i: (0, 0), memory_space=pltpu.VMEM)
        )

    outs = pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shapes,
        interpret=interpret,
        # arbitrary (sequential): dw/db += accumulation across grid steps
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 2**20,
            dimension_semantics=("arbitrary",),
        ),
    )(op, dp, tp, gp, *w_cast, *b_cast)

    k = 3 if need_input_grads else 0
    if need_input_grads:
        d_o = outs[0][:r].astype(origins.dtype)
        d_d = outs[1][:r].astype(dirs.dtype)
        d_t = outs[2][: r * num_samples].astype(ts.dtype)
    else:
        d_o = jnp.zeros_like(origins)
        d_d = jnp.zeros_like(dirs)
        d_t = jnp.zeros_like(ts)
    dws = tuple(
        dw.astype(w.dtype) for dw, w in zip(outs[k : k + num_layers], weights)
    )
    dbs = tuple(
        db.reshape(b.shape).astype(b.dtype)
        for db, b in zip(outs[k + num_layers :], biases)
    )
    return d_o, d_d, d_t, dws, dbs


fused_ray_mlp.defvjp(_fused_ray_fwd, _fused_ray_bwd)


# ---------------------------------------------------------------------------
# Fused whole-field: ray-march + base MLP + SH + appearance + color head in
# one kernel. On top of fused_ray_mlp this removes the geo-feature round-trip
# ([N, 16] write + [N, 63] head-input concat read), the SH/direction and
# appearance broadcasts, and the color-head XLA layers: per block, the base
# output feeds the head directly in VMEM; only [N, C+2] (rgb, raw density,
# selector) ever reaches HBM.
# ---------------------------------------------------------------------------


def _sh4_2d(d):
    """Degree-4 real SH of unit directions, [r, 3] f32 -> [r, 16] f32.
    Same constants as ops.encodings.sh_encoding (reference utils/math.py),
    written 2-D (lane dim last) so it lowers in Mosaic; the backward is
    obtained with jax.vjp at trace time (pure polynomials)."""
    x, y, z = d[:, 0:1], d[:, 1:2], d[:, 2:3]
    xx, yy, zz = x * x, y * y, z * z
    comps = [
        jnp.full_like(x, 0.28209479177387814),
        0.4886025119029199 * y,
        0.4886025119029199 * z,
        0.4886025119029199 * x,
        1.0925484305920792 * x * y,
        1.0925484305920792 * y * z,
        0.9461746957575601 * zz - 0.31539156525251999,
        1.0925484305920792 * x * z,
        0.5462742152960396 * (xx - yy),
        0.5900435899266435 * y * (3 * xx - yy),
        2.890611442640554 * x * y * z,
        0.4570457994644658 * y * (5 * zz - 1),
        0.3731763325901154 * z * (5 * zz - 3),
        0.4570457994644658 * x * (5 * zz - 1),
        1.445305721320277 * z * (xx - yy),
        0.5900435899266435 * x * (xx - 3 * yy),
    ]
    return jnp.concatenate(comps, axis=1)


def _field_fwd_block(
    o, d, t, emb, base_w, base_b, head_w, head_b,
    num_samples, skips, freq_encoding, cdt, save=False,
):
    """Shared forward math on one VMEM block. Returns (rgb, raw_density,
    sel) plus, when save=True, everything the backward needs."""
    nb, nh = len(base_w), len(head_w)
    pos, d_rep, rep = _posgen_fwd(o, d, t, num_samples)
    x, sel, mag, safe = _contract_fwd(pos)
    enc, pre_enc = _encode(x, freq_encoding, 3)
    x0 = enc.astype(cdt)
    base_acts, base_pre = _mlp_fwd_save(
        x0, base_w, base_b, nb, "relu", None, skips
    )
    h = base_acts[-1]  # [blk, 1 + geo]
    sh = _sh4_2d(d)  # [blk_r, 16]
    sh_rep = jnp.dot(
        rep, sh, preferred_element_type=jnp.float32,
        precision=dot_precision(rep, sh),
    ).astype(cdt)
    parts = [sh_rep, h[:, 1:]]
    if emb is not None:
        parts.append(
            jnp.dot(
                rep, emb, preferred_element_type=jnp.float32,
                precision=dot_precision(rep, emb),
            ).astype(cdt)
        )
    head_in = jnp.concatenate(parts, axis=1)
    head_acts, head_pre = _mlp_fwd_save(
        head_in, head_w, head_b, nh, "relu", "sigmoid", ()
    )
    rgb = head_acts[-1]
    if not save:
        return rgb, h[:, :1], sel
    return (
        rgb, h[:, :1], sel,
        (pos, d_rep, rep, x, sel, mag, safe, pre_enc, x0,
         base_acts, base_pre, sh, head_in, head_acts, head_pre),
    )


def _field_fwd_kernel(
    nb, nh, skips, freq_encoding, num_samples, has_emb, refs
):
    i = 3 + (1 if has_emb else 0)
    o_ref, d_ref, t_ref = refs[0], refs[1], refs[2]
    emb_ref = refs[3] if has_emb else None
    base_w = refs[i : i + nb]
    base_b = refs[i + nb : i + 2 * nb]
    head_w = refs[i + 2 * nb : i + 2 * nb + nh]
    head_b = refs[i + 2 * nb + nh : i + 2 * nb + 2 * nh]
    out_ref = refs[i + 2 * nb + 2 * nh]

    cdt = base_w[0].dtype
    rgb, raw, sel = _field_fwd_block(
        o_ref[:].astype(jnp.float32), d_ref[:].astype(jnp.float32),
        t_ref[:].astype(jnp.float32),
        emb_ref[:].astype(jnp.float32) if has_emb else None,
        base_w, base_b, head_w, head_b, num_samples, skips, freq_encoding, cdt,
    )
    out_ref[:] = jnp.concatenate(
        [rgb.astype(out_ref.dtype), raw.astype(out_ref.dtype),
         sel.astype(out_ref.dtype)], axis=-1,
    )


def _field_bwd_kernel(
    nb, nh, skips, freq_encoding, num_samples, has_emb, num_channels, refs
):
    i = 4 + (1 if has_emb else 0)
    o_ref, d_ref, t_ref = refs[0], refs[1], refs[2]
    emb_ref = refs[3] if has_emb else None
    g_ref = refs[i - 1]
    base_w = refs[i : i + nb]
    base_b = refs[i + nb : i + 2 * nb]
    head_w = refs[i + 2 * nb : i + 2 * nb + nh]
    head_b = refs[i + 2 * nb + nh : i + 2 * nb + 2 * nh]
    outs = refs[i + 2 * nb + 2 * nh :]
    do_ref, dd_ref, dt_ref = outs[0], outs[1], outs[2]
    j = 3
    if has_emb:
        demb_ref = outs[3]
        j = 4
    dbase_w = outs[j : j + nb]
    dbase_b = outs[j + nb : j + 2 * nb]
    dhead_w = outs[j + 2 * nb : j + 2 * nb + nh]
    dhead_b = outs[j + 2 * nb + nh : j + 2 * nb + 2 * nh]

    step = pl.program_id(0)

    @pl.when(step == 0)
    def _init():
        for r in list(dbase_w) + list(dbase_b) + list(dhead_w) + list(dhead_b):
            r[:] = jnp.zeros_like(r)

    cdt = base_w[0].dtype
    o = o_ref[:].astype(jnp.float32)
    dirs = d_ref[:].astype(jnp.float32)
    t = t_ref[:].astype(jnp.float32)
    emb = emb_ref[:].astype(jnp.float32) if has_emb else None
    # SH via jax.vjp at trace time: pure polynomials, lowers like the forward
    sh, sh_vjp = jax.vjp(_sh4_2d, dirs)
    _, _, _, saved = _field_fwd_block(
        o, dirs, t, emb, base_w, base_b, head_w, head_b,
        num_samples, skips, freq_encoding, cdt, save=True,
    )
    (pos, d_rep, rep, x, sel, mag, safe, pre_enc, x0,
     base_acts, base_pre, _, head_in, head_acts, head_pre) = saved

    g = g_ref[:]
    g_rgb = g[:, :num_channels]
    g_raw = g[:, num_channels : num_channels + 1].astype(jnp.float32)

    d_headin = _mlp_bwd_from_saved(
        head_in, g_rgb, head_acts, head_pre, head_w, head_b, dhead_w, dhead_b,
        nh, "relu", "sigmoid", (),
    )
    d_sh_rep = d_headin[:, :16]
    geo = base_w[-1].shape[-1] - 1
    d_geo = d_headin[:, 16 : 16 + geo]
    g_base = jnp.concatenate([g_raw, d_geo], axis=1).astype(cdt)
    d_enc = _mlp_bwd_from_saved(
        x0, g_base, base_acts, base_pre, base_w, base_b, dbase_w, dbase_b,
        nb, "relu", None, skips,
    )
    dx = _encode_bwd(x, pre_enc, d_enc, freq_encoding, 3)
    d_pos = _contract_bwd(dx, pos, sel, mag, safe)
    do_ref[:] = jax.lax.dot_general(
        rep, d_pos, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=dot_precision(rep, d_pos),
    )
    # d(dirs): posgen transpose + SH chain
    d_dirs = jax.lax.dot_general(
        rep, d_pos * t, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=dot_precision(rep, d_pos),
    )
    d_sh = jax.lax.dot_general(
        rep, d_sh_rep.astype(jnp.float32), (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=dot_precision(rep),
    )
    dd_ref[:] = d_dirs + sh_vjp(d_sh)[0]
    dt_ref[:] = jnp.sum(d_pos * d_rep, axis=-1, keepdims=True)
    if has_emb:
        demb_ref[:] = jax.lax.dot_general(
            rep, d_headin[:, 16 + geo :].astype(jnp.float32),
            (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32,
            precision=dot_precision(rep),
        )


@functools.partial(jax.custom_vjp, nondiff_argnums=(8, 9, 10, 11, 12, 13))
def fused_field_mlp(
    origins: jax.Array,  # [R, 3] f32
    dirs: jax.Array,  # [R, 3] f32 unit directions
    ts: jax.Array,  # [R * S, 1] f32 sample midpoints
    emb: jax.Array,  # [R, E] f32 per-ray appearance embeddings
    base_weights: Tuple[jax.Array, ...],
    base_biases: Tuple[jax.Array, ...],
    head_weights: Tuple[jax.Array, ...],
    head_biases: Tuple[jax.Array, ...],
    num_samples: int,
    block_size: int = 2048,
    interpret: bool = False,
    skip_connections: Tuple[int, ...] = (),
    freq_encoding: Tuple[int, float, float, bool] = (10, 0.0, 9.0, True),
    compute_dtype: Optional[str] = None,
) -> jax.Array:
    """Whole NerfactoField forward in one kernel. Returns [R * S, C + 2]:
    C sigmoid color channels, the raw (pre-trunc_exp) density, and the
    in-scene selector. Head input layout matches the field: [SH4(dir),
    geo_feat, emb]."""
    return _fused_field_fwd_impl(
        origins, dirs, ts, emb, base_weights, base_biases, head_weights,
        head_biases, num_samples, block_size, interpret, skip_connections,
        freq_encoding, compute_dtype,
    )


def _field_cast(ws, bs, dtype):
    return [w.astype(dtype) for w in ws], [b.reshape(1, -1).astype(dtype) for b in bs]


def _fused_field_fwd_impl(
    origins, dirs, ts, emb, base_weights, base_biases, head_weights,
    head_biases, num_samples, block_size, interpret, skips, freq_encoding,
    compute_dtype,
):
    nb, nh = len(base_weights), len(head_weights)
    num_channels = head_weights[-1].shape[-1]
    dtype = jnp.dtype(compute_dtype) if compute_dtype is not None else jnp.float32
    width = max(w.shape[-1] for w in base_weights)
    blk, blk_r = _resolve_ray_blocks(
        block_size, num_samples, nb, width, dtype, bwd=False
    )
    op, dp, tp, r = _pad_rays(origins, dirs, ts, num_samples, blk_r)
    ep = jnp.concatenate(
        [emb, jnp.zeros((op.shape[0] - emb.shape[0], emb.shape[1]), emb.dtype)],
        axis=0,
    ) if op.shape[0] != emb.shape[0] else emb
    grid = op.shape[0] // blk_r

    bw, bb = _field_cast(base_weights, base_biases, dtype)
    hw, hb = _field_cast(head_weights, head_biases, dtype)

    kernel = functools.partial(
        lambda *refs: _field_fwd_kernel(
            nb, nh, tuple(skips), freq_encoding, num_samples, True, refs
        )
    )
    in_specs = [
        pl.BlockSpec((blk_r, 3), lambda i: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((blk_r, 3), lambda i: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((blk, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((blk_r, ep.shape[1]), lambda i: (i, 0), memory_space=pltpu.VMEM),
    ]
    for w in bw + bb + hw + hb:
        in_specs.append(pl.BlockSpec(w.shape, lambda i: (0, 0), memory_space=pltpu.VMEM))
    out = pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (blk, num_channels + 2), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct(
            (op.shape[0] * num_samples, num_channels + 2), dtype
        ),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 2**20,
            dimension_semantics=("parallel",),
        ),
    )(op, dp, tp, ep, *bw, *bb, *hw, *hb)
    return out[: r * num_samples]


def _fused_field_fwd(
    origins, dirs, ts, emb, base_weights, base_biases, head_weights,
    head_biases, num_samples, block_size, interpret, skip_connections,
    freq_encoding, compute_dtype,
):
    out = _fused_field_fwd_impl(
        origins, dirs, ts, emb, base_weights, base_biases, head_weights,
        head_biases, num_samples, block_size, interpret, skip_connections,
        freq_encoding, compute_dtype,
    )
    return out, (
        origins, dirs, ts, emb, base_weights, base_biases, head_weights,
        head_biases,
    )


def _fused_field_bwd(
    num_samples, block_size, interpret, skip_connections, freq_encoding,
    compute_dtype, res, g,
):
    (origins, dirs, ts, emb, base_weights, base_biases, head_weights,
     head_biases) = res
    nb, nh = len(base_weights), len(head_weights)
    num_channels = head_weights[-1].shape[-1]
    dtype = jnp.dtype(compute_dtype) if compute_dtype is not None else jnp.float32
    width = max(w.shape[-1] for w in base_weights)
    blk, blk_r = _resolve_ray_blocks(
        block_size, num_samples, nb, width, dtype, bwd=True
    )
    op, dp, tp, r = _pad_rays(origins, dirs, ts, num_samples, blk_r)
    ep = jnp.concatenate(
        [emb, jnp.zeros((op.shape[0] - emb.shape[0], emb.shape[1]), emb.dtype)],
        axis=0,
    ) if op.shape[0] != emb.shape[0] else emb
    gp, _ = _pad_batch(g.astype(dtype), blk)
    grid = op.shape[0] // blk_r

    bw, bb = _field_cast(base_weights, base_biases, dtype)
    hw, hb = _field_cast(head_weights, head_biases, dtype)

    kernel = functools.partial(
        lambda *refs: _field_bwd_kernel(
            nb, nh, tuple(skip_connections), freq_encoding, num_samples, True,
            num_channels, refs,
        )
    )
    in_specs = [
        pl.BlockSpec((blk_r, 3), lambda i: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((blk_r, 3), lambda i: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((blk, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((blk_r, ep.shape[1]), lambda i: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((blk, num_channels + 2), lambda i: (i, 0), memory_space=pltpu.VMEM),
    ]
    for w in bw + bb + hw + hb:
        in_specs.append(pl.BlockSpec(w.shape, lambda i: (0, 0), memory_space=pltpu.VMEM))

    out_shapes = [
        jax.ShapeDtypeStruct((op.shape[0], 3), jnp.float32),
        jax.ShapeDtypeStruct((op.shape[0], 3), jnp.float32),
        jax.ShapeDtypeStruct((op.shape[0] * num_samples, 1), jnp.float32),
        jax.ShapeDtypeStruct((op.shape[0], ep.shape[1]), jnp.float32),
    ]
    out_specs = [
        pl.BlockSpec((blk_r, 3), lambda i: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((blk_r, 3), lambda i: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((blk, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((blk_r, ep.shape[1]), lambda i: (i, 0), memory_space=pltpu.VMEM),
    ]
    for w in base_weights:
        out_shapes.append(jax.ShapeDtypeStruct(w.shape, jnp.float32))
        out_specs.append(pl.BlockSpec(w.shape, lambda i: (0, 0), memory_space=pltpu.VMEM))
    for b in base_biases:
        out_shapes.append(jax.ShapeDtypeStruct((1, b.shape[-1]), jnp.float32))
        out_specs.append(
            pl.BlockSpec((1, b.shape[-1]), lambda i: (0, 0), memory_space=pltpu.VMEM)
        )
    for w in head_weights:
        out_shapes.append(jax.ShapeDtypeStruct(w.shape, jnp.float32))
        out_specs.append(pl.BlockSpec(w.shape, lambda i: (0, 0), memory_space=pltpu.VMEM))
    for b in head_biases:
        out_shapes.append(jax.ShapeDtypeStruct((1, b.shape[-1]), jnp.float32))
        out_specs.append(
            pl.BlockSpec((1, b.shape[-1]), lambda i: (0, 0), memory_space=pltpu.VMEM)
        )

    outs = pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shapes,
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 2**20,
            dimension_semantics=("arbitrary",),
        ),
    )(op, dp, tp, ep, gp, *bw, *bb, *hw, *hb)

    d_o = outs[0][:r].astype(origins.dtype)
    d_d = outs[1][:r].astype(dirs.dtype)
    d_t = outs[2][: r * num_samples].astype(ts.dtype)
    d_e = outs[3][: emb.shape[0]].astype(emb.dtype)
    k = 4
    dbw = tuple(dw.astype(w.dtype) for dw, w in zip(outs[k : k + nb], base_weights))
    dbb = tuple(
        db.reshape(b.shape).astype(b.dtype)
        for db, b in zip(outs[k + nb : k + 2 * nb], base_biases)
    )
    dhw = tuple(
        dw.astype(w.dtype)
        for dw, w in zip(outs[k + 2 * nb : k + 2 * nb + nh], head_weights)
    )
    dhb = tuple(
        db.reshape(b.shape).astype(b.dtype)
        for db, b in zip(outs[k + 2 * nb + nh :], head_biases)
    )
    return d_o, d_d, d_t, d_e, dbw, dbb, dhw, dhb


fused_field_mlp.defvjp(_fused_field_fwd, _fused_field_bwd)
