"""Microbench: fused base-MLP bwd at flagship shapes — budget/block sweep.

Times fwd and fwd+bwd separately for the flagship base stack
(262144 pts, 8x256 skip@4, F=10 enc, out 16) across NS_FMLP_BWD_BUDGET_MB.
"""

import os
import subprocess
import sys
import time

import numpy as np


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

    # reduce to a scalar INSIDE jit: fetching any array element through the
    # axon tunnel transfers the whole buffer, so time via scalar outputs only
    jf = jax.jit(lambda x, ws, bs: jnp.sum(fwd(x, ws, bs).astype(jnp.float32)))

    def gsum(x, ws, bs):
        g = jax.grad(loss, argnums=(0, 1, 2))(x, ws, bs)
        return sum(jnp.sum(l) for l in jax.tree.leaves(g))

    jg = jax.jit(gsum)

    def timeit(fn, *args, reps=10):
        out = fn(*args)
        float(np.asarray(jax.tree.leaves(out)[0]).reshape(-1)[0])
        t0 = time.perf_counter()
        for _ in range(reps):
            out = fn(*args)
        float(np.asarray(jax.tree.leaves(out)[0]).reshape(-1)[0])
        return (time.perf_counter() - t0) / reps

    tf = timeit(jf, x, ws, bs)
    tg = timeit(jg, x, ws, bs)
    budget = os.environ.get("NS_FMLP_BWD_BUDGET_MB", "5")
    print(
        f"budget={budget}MB  fwd {tf*1000:7.2f} ms   fwd+grad {tg*1000:7.2f} ms"
        f"   (bwd ~{(tg-tf)*1000:6.2f} ms)",
        flush=True,
    )


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "one":
        run_one()
    else:
        env = dict(os.environ)
        env["PYTHONPATH"] = "/root/repo:/root/.axon_site"
        for mb in ["3", "5", "8", "10"]:
            env["NS_FMLP_BWD_BUDGET_MB"] = mb
            subprocess.run([sys.executable, __file__, "one"], env=env)
