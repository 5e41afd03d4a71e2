"""Global f32 matmul precision policy.

On TPU, JAX's DEFAULT matmul precision rounds float32 operands to bfloat16
(one MXU pass). Everywhere this framework *wants* bf16 compute it casts
explicitly (ops/mlp.py compute_dtype, the Pallas kernels' compute dtype), so
any matmul still seeing f32 operands is one whose operands are semantically
exact: transmittance/CDF prefix sums (utils.math.cumsum_mxu), one-hot
gathers/broadcasts of ray geometry, pose rotations, splat compositing.
Those silently losing 16 mantissa bits is never intended — CPU tests are
exact f32, so the mismatch would only surface as an unexplained on-TPU
quality gap. Entry points (trainer, bench, eval/render scripts, graft
entry) therefore pin the *default* to "highest" (exact f32 via multi-pass
MXU); explicit bf16 paths are unaffected (precision config only applies to
f32-input matmuls)."""

import os

import jax


def ensure_exact_f32_matmuls() -> None:
    """Pin the default f32 matmul precision (see module docstring).

    $NS_F32_PRECISION overrides the level for A/Bs: "highest" (6-pass MXU,
    bit-exact f32) is the default; "high" (bfloat16_3x) is already EXACT for
    every matmul where one operand is exactly bf16-representable — the
    one-hot gathers/broadcasts and tril prefix-sum masks that motivated the
    pin — and ~2^-18 relative elsewhere (pose rotations), at half the MXU
    passes; "default" restores the single-pass bf16 rounding."""
    apply_platform_env()
    level = os.environ.get("NS_F32_PRECISION", "highest")
    jax.config.update("jax_default_matmul_precision", level)


def apply_platform_env() -> None:
    """Re-assert $JAX_PLATFORMS into jax.config.

    Accelerator-plugin sitecustomize hooks (e.g. the axon TPU tunnel) call
    jax.config.update("jax_platforms", ...) at interpreter start, which
    CLOBBERS the environment variable — `JAX_PLATFORMS=cpu ns-train ...`
    would silently run (or hang) on the plugin backend. Every entry point
    calls this (via ensure_exact_f32_matmuls) so the user's env choice
    wins again."""
    env = os.environ.get("JAX_PLATFORMS")
    if env:
        try:
            jax.config.update("jax_platforms", env)
        except Exception:
            pass  # unknown platform strings surface at first device use
