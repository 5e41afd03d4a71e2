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
from typing import Callable, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


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
    pre = jnp.dot(x_f32, e, preferred_element_type=jnp.float32)
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
    dx = jnp.dot(d_pre, e.T, preferred_element_type=jnp.float32)
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
    h = x0
    for li in range(num_layers):
        if li in skips and li != 0:
            h = jnp.concatenate([x0, h], axis=-1)
        h = (
            jnp.dot(h, w_refs[li][:], preferred_element_type=jnp.float32)
            + b_refs[li][:].astype(jnp.float32)
        )
        if li < num_layers - 1:
            h = _apply_act(h, activation)
        else:
            h = _apply_act(h, out_activation)
        h = h.astype(cdt)
    out_ref[:] = h.astype(out_ref.dtype)


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
    in_dim = x0.shape[-1]
    h = x0
    post_acts = []  # activated output of each layer, compute dtype
    final_pre = None
    for li in range(num_layers):
        if li in skips and li != 0:
            h = jnp.concatenate([x0, h], axis=-1)
        pre = (
            jnp.dot(h, w_refs[li][:], preferred_element_type=jnp.float32)
            + b_refs[li][:].astype(jnp.float32)
        )
        if li < num_layers - 1:
            h = _apply_act(pre, activation).astype(cdt)
        else:
            final_pre = pre
            h = _apply_act(pre, out_activation).astype(cdt)
        post_acts.append(h)

    def layer_input(li):
        h_prev = x0 if li == 0 else post_acts[li - 1]
        if li in skips and li != 0:
            return jnp.concatenate([x0, h_prev], axis=-1)
        return h_prev

    # backward
    dx_accum = jnp.zeros_like(x0, dtype=jnp.float32)
    dh = g_ref[:].astype(jnp.float32)
    if out_activation == "sigmoid":
        y = jax.nn.sigmoid(final_pre)
        dh = dh * y * (1.0 - y)
    for li in reversed(range(num_layers)):
        if li < num_layers - 1 and activation == "relu":
            # f32 compare: sub-word comparisons are unsupported by Mosaic
            dh = dh * (post_acts[li].astype(jnp.float32) > 0.0)
        x_in = layer_input(li).astype(cdt)
        dhc = dh.astype(cdt)
        # batch-contracting dot_general == x_in.T @ dhc without asking Mosaic
        # to materialize a [width, blk] transpose first
        dw_refs[li][:] += jax.lax.dot_general(
            x_in, dhc, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        db_refs[li][:] += jnp.sum(dh, axis=0, keepdims=True)
        dh = jnp.dot(dhc, w_refs[li][:].T, preferred_element_type=jnp.float32)
        if li in skips and li != 0:
            # layer input was concat([x0, h_prev]); split the gradient
            dx_accum = dx_accum + dh[:, :in_dim]
            dh = dh[:, in_dim:]
        if li == 0:
            dx_accum = dx_accum + dh
    if freq_encoding is not None:
        dx_accum = _encode_bwd(raw, pre_enc, dx_accum, freq_encoding, x_ref.shape[-1])
    dx_ref[:] = dx_accum.astype(dx_ref.dtype)


def _pad_batch(x, blk):
    n = x.shape[0]
    pad = (-n) % blk
    if pad:
        x = jnp.concatenate([x, jnp.zeros((pad, x.shape[1]), x.dtype)], axis=0)
    return x, n


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


def _fused_mlp_fwd_impl(x, weights, biases, activation, out_activation, block_size, interpret, skips=(), freq_encoding=None, compute_dtype=None):
    num_layers = len(weights)
    out_dim = weights[-1].shape[-1]
    dtype = jnp.dtype(compute_dtype) if compute_dtype is not None else x.dtype
    # fwd VMEM: f32 pre-activations [blk, width] + bf16 h + encoding temps
    width = max(w.shape[-1] for w in weights)
    per_point = width * 6
    if freq_encoding is not None:
        per_point += 4 * 1024  # lane-padded f32 encoding temps (see bwd)
    block_size = min(
        block_size, max(512, (24 * 2**20) // max(per_point, 1) // 512 * 512)
    )
    xp, n = _pad_batch(x, block_size)
    npad = xp.shape[0]

    w_cast = [w.astype(dtype) for w in weights]
    b_cast = [b.reshape(1, -1).astype(dtype) for b in biases]

    kernel = functools.partial(
        lambda *refs: _fwd_kernel(
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
    out = pl.pallas_call(
        kernel,
        grid=(npad // block_size,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (block_size, out_dim), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((npad, out_dim), dtype),
        interpret=interpret,
        # parallel: point blocks are independent -> Mosaic may pipeline the
        # per-block input DMA against compute across grid steps
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 2**20,
            dimension_semantics=("parallel",),
        ),
    )(xp, *w_cast, *b_cast)
    return out[:n]


def _fused_mlp_fwd(x, weights, biases, activation, out_activation, block_size, interpret, skip_connections=(), freq_encoding=None, compute_dtype=None):
    out = _fused_mlp_fwd_impl(
        x, weights, biases, activation, out_activation, block_size, interpret,
        skip_connections, freq_encoding, compute_dtype,
    )
    return out, (x, weights, biases)


def _fused_mlp_bwd(activation, out_activation, block_size, interpret, skip_connections, freq_encoding, compute_dtype, res, g):
    x, weights, biases = res
    num_layers = len(weights)
    dtype = jnp.dtype(compute_dtype) if compute_dtype is not None else x.dtype
    # The bwd kernel holds per-layer activations in VMEM; shrink the block so
    # num_layers * block * width activations stay well under the 16 MB limit.
    width = max(w.shape[-1] for w in weights)
    act_bytes = 2 if dtype == jnp.bfloat16 else 4
    per_point = num_layers * width * act_bytes
    if freq_encoding is not None:
        # In-kernel encoding recompute keeps ~a dozen [blk, <=128-lane] f32
        # temps alive (raw, pre, sin, cos, d_enc slices, dx); every narrow
        # vector pads its lane dim to 128, so the cost is ~flat in F
        # (measured 4.8-7.8 KB/point on v5e for F=7..10).
        per_point += 8 * 1024
    # activations get ~1/3 of VMEM: weights + f32 dh/dw/dx + in/out blocks
    # share the rest (measured: 5 MB fits for 8x256 stacks)
    import os

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

    kernel = functools.partial(
        lambda *refs: _bwd_kernel(
            num_layers, activation, out_activation, tuple(skip_connections),
            freq_encoding, refs,
        )
    )
    in_specs = [
        pl.BlockSpec((block_size, xp.shape[1]), lambda i: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((block_size, gp.shape[1]), lambda i: (i, 0), memory_space=pltpu.VMEM),
    ]
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
    )(xp, gp, *w_cast, *b_cast)

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
