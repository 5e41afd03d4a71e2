"""Microbench: fused base-MLP kernel VARIANTS at flagship shapes.

Sweeps the r4 kernel levers — save-acts backward (NS_FMLP_SAVE_ACTS:
stream fwd activations instead of recomputing, ~1/3 less bwd MXU work for
overlapped HBM traffic) and split-skip (NS_FMLP_SPLIT_SKIP: skip layer as
two matmuls, no misaligned [blk, in+width] concat) — each combo in its own
subprocess (the flags are read at trace time; a fresh process guarantees a
fresh trace), timing fwd and fwd+grad for the flagship base stack
(262144 pts, 8x256 skip@4, F=10 in-kernel encoding, out 16, bf16 compute).

Usage (on a live TPU):  python tools/bench_kernel_variants.py
Each child is timeout-bounded by the caller's shell if desired; children
are never killed mid-compile by this script itself.
"""

import os
import subprocess
import sys
import time

import numpy as np

VARIANTS = [
    ("baseline", {}),
    ("save-acts", {"NS_FMLP_SAVE_ACTS": "1"}),
    ("split-skip", {"NS_FMLP_SPLIT_SKIP": "1"}),
    ("both", {"NS_FMLP_SAVE_ACTS": "1", "NS_FMLP_SPLIT_SKIP": "1"}),
    # r5: sub-block interleave (983a25b) on top of the shipped kernel-tuned
    # combo — k row-slices in flight hide MXU pipeline drain between
    # dependent matmuls
    ("both+il2", {"NS_FMLP_SAVE_ACTS": "1", "NS_FMLP_SPLIT_SKIP": "1",
                  "NS_FMLP_INTERLEAVE": "2"}),
    ("both+il4", {"NS_FMLP_SAVE_ACTS": "1", "NS_FMLP_SPLIT_SKIP": "1",
                  "NS_FMLP_INTERLEAVE": "4"}),
]


def run_one():
    import jax
    import jax.numpy as jnp
    from nerfstudio_thermal_tpu.ops.pallas.fused_mlp import fused_mlp

    n = 262144
    layers, width, out_dim, nf = 8, 256, 16, 10
    skips = (4,)
    fe = (nf, 0.0, float(nf - 1), True)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(0, 1, (n, 3)).astype(np.float32))
    key = jax.random.PRNGKey(0)
    dims = [63] + [width] * layers
    ws, bs = [], []
    for li in range(layers):
        din = dims[li] + (63 if li in skips and li != 0 else 0)
        dout = out_dim if li == layers - 1 else width
        key, k1 = jax.random.split(key)
        ws.append(jax.random.normal(k1, (din, dout), jnp.float32) * 0.05)
        bs.append(jnp.zeros((dout,), jnp.float32))
    ws, bs = tuple(ws), tuple(bs)

    blk = int(os.environ.get("NS_FMLP_BLOCK", "2048"))

    def fwd(x, ws, bs):
        return fused_mlp(
            x, ws, bs, "relu", None, blk, False, skips, fe, "bfloat16"
        )

    def loss(x, ws, bs):
        return jnp.sum(fwd(x, ws, bs).astype(jnp.float32) ** 2)

    # scalar outputs only: fetching any array element through the axon
    # tunnel transfers the whole buffer
    jf = jax.jit(lambda x, ws, bs: jnp.sum(fwd(x, ws, bs).astype(jnp.float32)))

    def gsum(x, ws, bs):
        g = jax.grad(loss, argnums=(0, 1, 2))(x, ws, bs)
        return sum(jnp.sum(l) for l in jax.tree.leaves(g))

    jg = jax.jit(gsum)

    def timeit(fn, *args, reps=10):
        out = fn(*args)
        float(np.asarray(out).reshape(-1)[0])
        t0 = time.perf_counter()
        for _ in range(reps):
            out = fn(*args)
        float(np.asarray(out).reshape(-1)[0])
        return (time.perf_counter() - t0) / reps

    tf = timeit(jf, x, ws, bs)
    tg = timeit(jg, x, ws, bs)
    name = os.environ.get("NS_VARIANT_NAME", "?")
    budget = os.environ.get("NS_FMLP_BWD_BUDGET_MB", "5")
    print(
        f"{name:<11} blk={blk} budget={budget}MB  fwd {tf*1000:7.2f} ms   "
        f"fwd+grad {tg*1000:7.2f} ms   (bwd ~{(tg-tf)*1000:6.2f} ms)",
        flush=True,
    )


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "one":
        run_one()
    else:
        base_env = dict(os.environ)
        base_env["PYTHONPATH"] = "/root/repo:/root/.axon_site"
        budgets = (sys.argv[1:] or ["5"])  # e.g. `... 5 8` sweeps budgets
        for name, flags in VARIANTS:
            for mb in budgets:
                env = {**base_env, **flags,
                       "NS_VARIANT_NAME": name,
                       "NS_FMLP_BWD_BUDGET_MB": mb}
                subprocess.run([sys.executable, __file__, "one"], env=env)
