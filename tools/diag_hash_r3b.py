"""Round-3 diagnosis, part 2: find the fastest gather/scatter formulation on
v5e and the knobs that move the rate (width, table size, sortedness, dtype,
in-program overlap).  Informs the hash_encode rewrite + ROOFLINE.md."""

import time

import numpy as np


def _sync(r):
    import jax

    leaves = jax.tree_util.tree_leaves(r)
    float(np.asarray(leaves[0]).reshape(-1)[0])


def timeit(fn, *args, reps=3, warmup=1, label=""):
    t0 = time.perf_counter()
    for _ in range(warmup):
        r = fn(*args)
        _sync(r)
    c = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(reps):
        r = fn(*args)
    _sync(r)
    dt = (time.perf_counter() - t0) / reps
    return dt, c


def main():
    import jax
    import jax.numpy as jnp

    print("device:", jax.devices()[0], flush=True)
    rng = np.random.default_rng(0)
    NROWS = 6_291_456  # 6M rows, the main-field per-corner volume

    # --- A. row width sweep at T=2^19*16 rows available, width W
    total = 2**19 * 16
    idx = jnp.asarray(rng.integers(0, total, size=(NROWS,)).astype(np.int32))
    # W=1 is skipped: single-column tables trigger a pathological >30 min
    # XLA compile on v5e (same family as the 209 s col-gather compile in
    # diag_hash_r3.py).
    for W in [2, 4, 8]:
        tab = jnp.asarray(rng.normal(size=(total, W)).astype(np.float32))
        f = jax.jit(lambda t, i: t[i])
        dt, c = timeit(f, tab, idx)
        print(f"A. row gather [{NROWS/1e6:.0f}M] from [{total/1e6:.1f}M,{W}] f32: "
              f"{dt*1e3:8.1f} ms  {NROWS/dt/1e9:5.2f} G rows/s (compile {c:.1f}s)", flush=True)

    # --- B. table size sweep at fixed rows, W=2
    for logt in [12, 15, 17, 19, 23]:
        tsz = 2**logt
        tab = jnp.asarray(rng.normal(size=(tsz, 2)).astype(np.float32))
        ii = jnp.asarray(rng.integers(0, tsz, size=(NROWS,)).astype(np.int32))
        f = jax.jit(lambda t, i: t[i])
        dt, c = timeit(f, tab, ii)
        print(f"B. row gather [{NROWS/1e6:.0f}M] from [2^{logt},2]: "
              f"{dt*1e3:8.1f} ms  {NROWS/dt/1e9:5.2f} G rows/s", flush=True)

    # --- C. sorted indices
    tab2 = jnp.asarray(rng.normal(size=(total, 2)).astype(np.float32))
    idx_sorted = jnp.sort(idx)
    f_sorted = jax.jit(lambda t, i: jnp.take(t, i, axis=0, indices_are_sorted=True))
    dt, c = timeit(f_sorted, tab2, idx_sorted)
    print(f"C. sorted row gather hint:               {dt*1e3:8.1f} ms  {NROWS/dt/1e9:5.2f} G rows/s", flush=True)

    # --- C2. how fast IS a sort of 6M int32?
    f_sort = jax.jit(lambda i: jnp.sort(i))
    dt, c = timeit(f_sort, idx)
    print(f"C2. jnp.sort 6M int32:                   {dt*1e3:8.1f} ms (compile {c:.1f}s)", flush=True)
    f_argsort = jax.jit(lambda i: jnp.argsort(i))
    dt, c = timeit(f_argsort, idx)
    print(f"C3. jnp.argsort 6M int32:                {dt*1e3:8.1f} ms", flush=True)

    # --- D. bf16 row gather (4-byte rows)
    tab_bf = tab2.astype(jnp.bfloat16)
    f = jax.jit(lambda t, i: t[i])
    dt, c = timeit(f, tab_bf, idx)
    print(f"D. bf16 row gather [.,2]:                {dt*1e3:8.1f} ms  {NROWS/dt/1e9:5.2f} G rows/s", flush=True)

    # --- E. in-program overlap: 8 independent row gathers in one jit
    idxs8 = jnp.asarray(rng.integers(0, total, size=(8, NROWS)).astype(np.int32))

    def gather8(t, ii):
        outs = [t[ii[c]] for c in range(8)]
        return sum(o.sum() for o in outs)

    dt, c = timeit(jax.jit(gather8), tab2, idxs8)
    print(f"E. 8 row gathers in one program:         {dt*1e3:8.1f} ms  {8*NROWS/dt/1e9:5.2f} G rows/s agg (compile {c:.1f}s)", flush=True)

    # --- F. scatter variants
    vals = jnp.asarray(rng.normal(size=(NROWS,)).astype(np.float32))
    f = jax.jit(lambda i, v: jnp.zeros((total,), jnp.float32).at[i].add(v))
    dt, c = timeit(f, idx, vals)
    print(f"F1. flat scatter-add 6M:                 {dt*1e3:8.1f} ms  {NROWS/dt/1e9:5.2f} G rows/s", flush=True)

    f = jax.jit(lambda i, v: jnp.zeros((total,), jnp.float32).at[i].add(v, mode="drop"))
    dt, c = timeit(f, idx, vals)
    print(f"F2. flat scatter-add mode=drop:          {dt*1e3:8.1f} ms  {NROWS/dt/1e9:5.2f} G rows/s", flush=True)

    # sorted scatter
    order = jnp.argsort(idx)
    f = jax.jit(
        lambda i, v, o: jnp.zeros((total,), jnp.float32)
        .at[i[o]]
        .add(v[o], indices_are_sorted=True)
    )
    dt, c = timeit(f, idx, vals, order)
    print(f"F3. argsort+sorted scatter (incl sort):  {dt*1e3:8.1f} ms", flush=True)

    # segment_sum after sort
    def seg(i, v):
        o = jnp.argsort(i)
        return jax.ops.segment_sum(v[o], i[o], num_segments=total,
                                   indices_are_sorted=True)

    dt, c = timeit(jax.jit(seg), idx, vals)
    print(f"F4. argsort+segment_sum:                 {dt*1e3:8.1f} ms (compile {c:.1f}s)", flush=True)

    # --- G. 8 scatters in one program (overlap?)
    vals8 = jnp.asarray(rng.normal(size=(8, NROWS)).astype(np.float32))

    def scat8(ii, vv):
        z = jnp.zeros((total,), jnp.float32)
        for c in range(8):
            z = z.at[ii[c]].add(vv[c])
        return z

    dt, c = timeit(jax.jit(scat8), idxs8, vals8)
    print(f"G. 8 flat scatter-adds in one program:   {dt*1e3:8.1f} ms  {8*NROWS/dt/1e9:5.2f} G rows/s agg", flush=True)

    # one concatenated scatter of 8x6M
    def scat1(ii, vv):
        return jnp.zeros((total,), jnp.float32).at[ii.reshape(-1)].add(vv.reshape(-1))

    dt, c = timeit(jax.jit(scat1), idxs8, vals8)
    print(f"G2. one 50M-element flat scatter-add:    {dt*1e3:8.1f} ms  {8*NROWS/dt/1e9:5.2f} G rows/s", flush=True)


if __name__ == "__main__":
    main()
