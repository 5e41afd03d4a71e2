"""Real-TPU bench: dynamic-gather hash kernel vs XLA gather path at train
shapes (main field + proposal encoders of the parity workload)."""

import time

import numpy as np


def _sync(x):
    import jax

    leaf = jax.tree_util.tree_leaves(x)[0]
    float(np.asarray(leaf).reshape(-1)[0])


def timeit(fn, *args, reps=5, warmup=1):
    t0 = time.perf_counter()
    for _ in range(warmup):
        r = fn(*args)
        _sync(r)
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(reps):
        r = fn(*args)
    _sync(r)
    return (time.perf_counter() - t0) / reps, compile_s


def main():
    import jax
    import jax.numpy as jnp

    from nerfstudio_thermal_tpu.ops.encodings import (
        hash_encode,
        hash_grid_scalings,
    )
    from nerfstudio_thermal_tpu.ops.pallas.hash_gather import hash_encode_dg

    print("device:", jax.devices()[0], flush=True)
    rng = np.random.default_rng(0)

    cases = [
        ("field  L=16 T=2^19 N=393k", 16, 19, 8192 * 48, 16, 2048),
        ("prop1  L=5  T=2^17 N=2.1M", 5, 17, 8192 * 256, 16, 128),
        ("prop2  L=5  T=2^17 N=786k", 5, 17, 8192 * 96, 16, 256),
    ]
    for name, L, logt, n, minr, maxr in cases:
        T = 2**logt
        table = jnp.asarray(rng.normal(size=(L * T, 2)).astype(np.float32) * 1e-2)
        pos = jnp.asarray(rng.uniform(0, 1, (n, 3)).astype(np.float32))
        scal = jnp.asarray(hash_grid_scalings(L, minr, maxr))
        rows = n * L * 8

        for label, enc in (("dg ", hash_encode_dg), ("xla", hash_encode)):
            try:
                fwd = jax.jit(lambda t, p, e=enc: e(t, p, scal, T, jnp.float32))
                dt, cs = timeit(fwd, table, pos)
                print(f"{name} {label} fwd     : {dt*1e3:8.1f} ms "
                      f"({rows/dt/1e9:6.2f} G rows/s, compile {cs:.0f}s)",
                      flush=True)

                def loss(t, p, e=enc):
                    return jnp.sum(e(t, p, scal, T, jnp.float32) ** 2)

                vg = jax.jit(jax.grad(loss, argnums=(0, 1)))
                dt, cs = timeit(vg, table, pos)
                print(f"{name} {label} fwd+bwd : {dt*1e3:8.1f} ms "
                      f"(compile {cs:.0f}s)", flush=True)
            except Exception as e:
                print(f"{name} {label}: FAIL {type(e).__name__}: "
                      f"{(str(e).splitlines() or [repr(e)])[0][:160]}", flush=True)

    # numerical check dg vs xla on TPU lowering (1000 pts, big table)
    T = 2**19
    L = 16
    table = jnp.asarray(rng.normal(size=(L * T, 2)).astype(np.float32) * 1e-2)
    pos = jnp.asarray(rng.uniform(0, 1, (1000, 3)).astype(np.float32))
    scal = jnp.asarray(hash_grid_scalings(L, 16, 2048))
    a = hash_encode_dg(table, pos, scal, T, jnp.float32)
    b = hash_encode(table, pos, scal, T, jnp.float32)
    print("max |dg - xla| @2^19:", float(jnp.max(jnp.abs(a - b))), flush=True)


if __name__ == "__main__":
    main()
