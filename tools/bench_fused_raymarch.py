"""Per-component fused-ray vs XLA timing on TPU (see tools/tpu_sweep_r3.sh).

Usage: python tools/bench_fused_raymarch.py {base|prop1|prop2} [fwd|bwd|all]
Env: NS_RAY_NIG=0 (skip input grads), NS_RAY_BLK, NS_FRAY_BWD_BUDGET_MB.
"""
import sys
import time

sys.path.insert(0, "/root/repo")
import jax
import jax.numpy as jnp
from nerfstudio_thermal_tpu.ops.pallas.fused_mlp import fused_mlp, fused_ray_mlp


def timeit(f, *args, n=20):
    r = f(*args)
    float(jnp.sum(jax.tree.leaves(r)[0]))  # tunnel sync
    t0 = time.perf_counter()
    for _ in range(n):
        r = f(*args)
    float(jnp.sum(jax.tree.leaves(r)[0]))
    return (time.perf_counter() - t0) / n * 1000


def setup(R, S, dims, nf, skips):
    enc = 3 * nf * 2 + 3
    o = jax.random.normal(jax.random.PRNGKey(0), (R, 3)) * 0.3
    d = jax.random.normal(jax.random.PRNGKey(1), (R, 3))
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    ts = jax.random.uniform(jax.random.PRNGKey(2), (R * S, 1)) * 4
    ws, bs = [], []
    prev = enc
    for i, w in enumerate(dims):
        din = prev + (enc if i in skips and i != 0 else 0)
        ws.append(jax.random.normal(jax.random.PRNGKey(10 + i), (din, w)) * 0.1)
        bs.append(jnp.zeros((w,)))
        prev = w
    return o, d, ts, tuple(ws), tuple(bs), enc


def xla_field(o, d, ts, ws, bs, S, nf, skips, pallas_mlp):
    """Current XLA path: posgen + contraction + selector outside; MLP either
    fused-pallas (base) or XLA (props), encoding in-kernel or XLA."""
    R = o.shape[0]
    t = ts.reshape(R, S, 1)
    pos = (o[:, None, :] + t * d[:, None, :]).reshape(-1, 3)
    mag = jnp.max(jnp.abs(pos), axis=-1, keepdims=True)
    safe = jnp.maximum(mag, 1e-12)
    cpos = jnp.where(mag < 1.0, pos, (2.0 - 1.0 / safe) * (pos / safe))
    p01 = (cpos + 2.0) * 0.25
    sel = jnp.all((p01 > 0.0) & (p01 < 1.0), axis=-1, keepdims=True)
    x = p01 * sel
    if pallas_mlp:
        h = fused_mlp(x, ws, bs, "relu", None, 2048, False, skips,
                      (nf, 0.0, nf - 1.0, True), "bfloat16")
    else:
        exps = jnp.linspace(0.0, nf - 1.0, nf)
        freqs = 2.0 * jnp.pi * 2.0**exps
        pre = (x[..., None] * freqs).reshape(x.shape[0], 3 * nf)
        hh = jnp.concatenate([jnp.sin(pre), jnp.cos(pre), x], axis=-1).astype(jnp.bfloat16)
        h0 = hh
        for i, (w, b) in enumerate(zip(ws, bs)):
            if i in skips and i != 0:
                hh = jnp.concatenate([h0, hh], axis=-1)
            hh = hh @ w.astype(jnp.bfloat16) + b.astype(jnp.bfloat16)
            if i < len(ws) - 1:
                hh = jax.nn.relu(hh)
        h = hh
    return h.astype(jnp.float32) * sel


def run(tag, R, S, dims, nf, skips, pallas_mlp):
    o, d, ts, ws, bs, enc = setup(R, S, dims, nf, skips)
    fe = (nf, 0.0, nf - 1.0, True)

    import os
    nig = os.environ.get("NS_RAY_NIG", "1") == "1"
    blk = int(os.environ.get("NS_RAY_BLK", "2048"))

    def loss_ray(o, d, ts, ws, bs):
        r = fused_ray_mlp(o, d, ts, ws, bs, S, "relu", None, blk, False, skips, fe, "bfloat16", nig)
        return jnp.sum(r[:, :-1].astype(jnp.float32) * r[:, -1:].astype(jnp.float32))

    def loss_xla(o, d, ts, ws, bs):
        return jnp.sum(xla_field(o, d, ts, ws, bs, S, nf, skips, pallas_mlp))

    which = sys.argv[2] if len(sys.argv) > 2 else "all"
    import os
    if which in ("all", "fwd"):
        fray = jax.jit(loss_ray)
        print(f"{tag} fwd ray {timeit(fray, o, d, ts, ws, bs):.2f} ms", flush=True)
        fxla = jax.jit(loss_xla)
        print(f"{tag} fwd xla {timeit(fxla, o, d, ts, ws, bs):.2f} ms", flush=True)
    if which in ("all", "bwd"):
        gray = jax.jit(jax.grad(loss_ray, argnums=(0, 1, 2, 3, 4)))
        print(f"{tag} f+b ray {timeit(gray, o, d, ts, ws, bs):.2f} ms", flush=True)
        gxla = jax.jit(jax.grad(loss_xla, argnums=(0, 1, 2, 3, 4)))
        print(f"{tag} f+b xla {timeit(gxla, o, d, ts, ws, bs):.2f} ms", flush=True)


CASES = {
    "base": ("base 8x256 S=32", 8192, 32, (256,) * 7 + (16,), 10, (4,), True),
    "prop1": ("prop1 3x64 S=128", 8192, 128, (64, 64, 1), 5, (), False),
    "prop2": ("prop2 3x64 S=48", 8192, 48, (64, 64, 1), 7, (), False),
}
run(*CASES[sys.argv[1]])
