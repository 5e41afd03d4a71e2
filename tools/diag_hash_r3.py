"""Round-3 diagnosis: where do the 14 s/step of the 2^19 hash-parity config go?

Micro-times, on the real TPU, each suspect of the hash encoding at the main
field's train shape (N = 8192 rays x 48 samples = 393216 pts, L=16, T=2^19):

  1. raw random gather rate ([L,N] int32 idx from a [L*T] f32 vector)
  2. gather variants: row gather from [L*T, 2]; packed 2xbf16-in-f32 gather
  3. raw scatter-add rate (one op, and 16 small ops like the current bwd)
  4. hash_encode fwd only
  5. hash_encode fwd+bwd (table grad only; + position grad)

Timing: fetch a scalar through the tunnel (block_until_ready lies; CLAUDE.md).
"""

import time

import numpy as np


def timeit(fn, *args, reps=3, warmup=1):
    t0 = time.perf_counter()
    for _ in range(warmup):
        r = fn(*args)
        _sync(r)
    print(f"   [warmup+compile {time.perf_counter()-t0:.1f}s]", flush=True)
    t0 = time.perf_counter()
    for _ in range(reps):
        r = fn(*args)
    _sync(r)
    return (time.perf_counter() - t0) / reps


def _sync(r):
    import jax

    leaves = jax.tree_util.tree_leaves(r)
    x = leaves[0]
    float(x.reshape(-1)[0])


def main():
    import jax
    import jax.numpy as jnp

    from nerfstudio_thermal_tpu.ops.encodings import (
        hash_encode,
        hash_grid_scalings,
    )

    print("device:", jax.devices()[0])
    rng = np.random.default_rng(0)

    L, T, F = 16, 2**19, 2
    N = 8192 * 48
    n_idx = L * N  # total gather rows
    print(f"L={L} T=2^19 N={N} -> {n_idx/1e6:.1f} M gather rows per corner, x8 corners")

    table = jnp.asarray(rng.normal(size=(L * T, F)).astype(np.float32) * 1e-2)
    table_1d = table[:, 0]
    idx = jnp.asarray(rng.integers(0, L * T, size=(L, N)).astype(np.int32))
    idx_flat = idx.reshape(-1)
    vals = jnp.asarray(rng.normal(size=(L, N)).astype(np.float32))

    # --- 1. raw gather, current layout: [L*T] f32 vector, [L,N] idx
    g1 = jax.jit(lambda t, i: t[i])
    dt = timeit(g1, table_1d, idx)
    print(f"1. col gather [L,N] from [L*T] f32:      {dt*1e3:8.1f} ms  {n_idx/dt/1e9:6.2f} G rows/s")

    # --- 2a. row gather [L*T, 2]
    g2 = jax.jit(lambda t, i: t[i])
    dt = timeit(g2, table, idx)
    print(f"2a. row gather [L,N,2] from [L*T,2] f32: {dt*1e3:8.1f} ms  {n_idx/dt/1e9:6.2f} G rows/s")

    # --- 2b. packed: 2xbf16 bitcast into one f32, single gather
    tb_bf = table.astype(jnp.bfloat16)  # [L*T, 2]
    packed = jax.lax.bitcast_convert_type(tb_bf.reshape(-1, 2), jnp.float32).reshape(-1)

    def g3(p, i):
        got = p[i]  # [L, N] f32 (bit-packed)
        pair = jax.lax.bitcast_convert_type(got, jnp.bfloat16)  # [L, N, 2]
        return pair.astype(jnp.float32)

    dt = timeit(jax.jit(g3), packed, idx)
    print(f"2b. packed 2xbf16 single gather:         {dt*1e3:8.1f} ms  {n_idx/dt/1e9:6.2f} G rows/s")

    # --- 2c. gather with take along the flat dim via one-hot? skip. 2c: u32 gather
    # --- 3a. one big scatter-add
    s1 = jax.jit(lambda i, v: jnp.zeros((L * T,), jnp.float32).at[i].add(v))
    dt = timeit(s1, idx_flat, vals.reshape(-1))
    print(f"3a. scatter-add {n_idx/1e6:.0f}M -> [L*T] f32:      {dt*1e3:8.1f} ms  {n_idx/dt/1e9:6.2f} G rows/s")

    # --- 3b. scatter-add of [N,2] rows
    vals2 = jnp.asarray(rng.normal(size=(L * N, F)).astype(np.float32))
    s2 = jax.jit(lambda i, v: jnp.zeros((L * T, F), jnp.float32).at[i].add(v))
    dt = timeit(s2, idx_flat, vals2)
    print(f"3b. row scatter-add [{n_idx/1e6:.0f}M,2] -> [L*T,2]: {dt*1e3:8.1f} ms  {n_idx/dt/1e9:6.2f} G rows/s")

    # --- 4. hash_encode fwd at train shape
    pos = jnp.asarray(rng.uniform(0, 1, (N, 3)).astype(np.float32))
    scal = jnp.asarray(hash_grid_scalings(L, 16, 2048))
    fwd = jax.jit(lambda t, p: hash_encode(t, p, scal, T, jnp.float32))
    dt = timeit(fwd, table, pos)
    rows = N * L * 8
    print(f"4. hash_encode fwd (8 corners):          {dt*1e3:8.1f} ms  {rows/dt/1e9:6.2f} G rows/s")

    # --- 5a. fwd+bwd table-grad only
    def loss_t(t, p):
        return jnp.sum(hash_encode(t, p, scal, T, jnp.float32) ** 2)

    vg_t = jax.jit(jax.grad(loss_t, argnums=0))
    dt = timeit(vg_t, table, pos)
    print(f"5a. fwd+bwd (table grad only):           {dt*1e3:8.1f} ms")

    # --- 5b. fwd+bwd table+position grads
    vg_tp = jax.jit(jax.grad(loss_t, argnums=(0, 1)))
    dt = timeit(vg_tp, table, pos)
    print(f"5b. fwd+bwd (table+pos grads):           {dt*1e3:8.1f} ms")


if __name__ == "__main__":
    main()
