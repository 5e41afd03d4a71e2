"""Explicit matmul precision for Pallas kernel bodies.

The global `jax_default_matmul_precision=highest` pin (utils/precision.py)
is an XLA-level policy: XLA ignores it for bf16-input dots. Mosaic does
NOT — a traced `jnp.dot` inside a kernel inherits the config as
`tpu.matmul(..., contract_precision<fp32>)`, which Mosaic rejects on bf16
operands ("Bad lhs type"), and which turns every f32 one-hot/selector
matmul into a 6-pass product. Kernels manage their dtypes by explicit
casts, so every kernel dot states its precision explicitly:

- bf16 (compute-dtype) operands -> DEFAULT: the native single-pass MXU
  bf16 x bf16 -> f32 mode, which is the kernel's intent.
- f32 operands -> HIGHEST (exact f32 via multi-pass): these are the
  one-hot selectors / frequency matrices / tril masks where silent bf16
  rounding is never intended (see utils/precision.py). Where one operand
  is exactly bf16-representable (one-hots, 0/1 masks) HIGH would already
  be exact, but these dots are small; exactness wins by default.
  $NS_KERNEL_F32_PRECISION=high|default overrides for A/Bs.
"""

import os

import jax
import jax.numpy as jnp

_F32_PREC = {
    "highest": jax.lax.Precision.HIGHEST,
    "high": jax.lax.Precision.HIGH,
    "default": jax.lax.Precision.DEFAULT,
}[os.environ.get("NS_KERNEL_F32_PRECISION", "highest")]


def dot_precision(*operands) -> jax.lax.Precision:
    """Pick the explicit kernel-dot precision from the operand dtypes.

    Accepts arrays, tracers, or Pallas Refs (anything with `.dtype`)."""
    if any(o.dtype == jnp.bfloat16 for o in operands):
        return jax.lax.Precision.DEFAULT
    return _F32_PREC
