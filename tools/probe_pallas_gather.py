"""Probe: tpu.dynamic_gather support + speed on v5e.

The Mosaic lowering (jax pallas/mosaic/lowering.py:_gather_lowering_rule)
supports exactly two patterns, both with INDICES THE SAME SHAPE AS THE
OPERAND (what take_along_axis produces when index shape == operand shape):

    axis0: out[i,j] = x[idx[i,j], j]   (per-lane sublane gather)
    axis1: out[i,j] = x[i, idx[i,j]]   (per-sublane lane shuffle)

If both lower and run at VPU speed, a general hash-table gather is:

    A[i,:] = T[r_i, :]   via axis0 with idx broadcast per sublane row
    B[i,:] = A[i, c_i]   via axis1 with idx broadcast -> every lane = answer
    out[i] = B[i, 0]

i.e. one query per sublane row, ~3 vector ops per 128-lane row => orders of
magnitude faster than XLA's 0.09 G rows/s scalar-path gather.
"""

import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    print("device:", jax.devices()[0], flush=True)
    rng = np.random.default_rng(0)

    def bench(name, fn, check=None, reps=5, count=None):
        try:
            out = fn()
            err = -1.0
            if check is not None:
                err = float(np.max(np.abs(np.asarray(out) - check)))
            t0 = time.perf_counter()
            for _ in range(reps):
                out = fn()
            float(np.asarray(out).reshape(-1)[0])
            dt = (time.perf_counter() - t0) / reps
            extra = f"  {count/dt/1e9:.2f} G/s" if count else ""
            print(f"{name}: OK err={err:.2e}  {dt*1e3:.3f} ms{extra}", flush=True)
            return dt
        except Exception as e:
            first = (str(e).splitlines() or [repr(e)])[0]
            print(f"{name}: FAIL {type(e).__name__}: {first[:160]}", flush=True)
            return None

    R, C = 4096, 128
    T = jnp.asarray(rng.normal(size=(R, C)).astype(np.float32))

    # --- P1: axis0 sublane gather, depth 4096
    i0 = np.asarray(rng.integers(0, R, size=(R, C)).astype(np.int32))
    exp1 = np.take_along_axis(np.asarray(T), i0, axis=0)

    def k1(t, i, o):
        o[:] = jnp.take_along_axis(t[:], i[:, :, None], axis=0)[..., 0] \
            if False else jnp.take_along_axis(t[:], i[:], axis=0)

    bench("P1 axis0 depth-4096 [4096,128]", lambda: pl.pallas_call(
        k1, out_shape=jax.ShapeDtypeStruct((R, C), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(T, jnp.asarray(i0)), exp1, count=R * C)

    # --- P2: axis0 within [8,128]
    T8 = T[:8]
    i8 = np.asarray(rng.integers(0, 8, size=(8, C)).astype(np.int32))
    exp2 = np.take_along_axis(np.asarray(T8), i8, axis=0)

    bench("P2 axis0 depth-8 [8,128]", lambda: pl.pallas_call(
        k1, out_shape=jax.ShapeDtypeStruct((8, C), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(T8, jnp.asarray(i8)), exp2, count=8 * C)

    # --- P3: axis1 lane shuffle [1024,128]
    M = 1024
    Tm = T[:M]
    i1 = np.asarray(rng.integers(0, C, size=(M, C)).astype(np.int32))
    exp3 = np.take_along_axis(np.asarray(Tm), i1, axis=1)

    def k3(t, i, o):
        o[:] = jnp.take_along_axis(t[:], i[:], axis=1)

    bench("P3 axis1 [1024,128]", lambda: pl.pallas_call(
        k3, out_shape=jax.ShapeDtypeStruct((M, C), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(Tm, jnp.asarray(i1)), exp3, count=M * C)

    # --- P4: composed true gather: 4096 queries from the 2^19 table per call
    flat_q = rng.integers(0, R * C, size=(R,)).astype(np.int32)
    expq = np.asarray(T).reshape(-1)[flat_q]
    rq = jnp.asarray((flat_q // C).astype(np.int32))
    cq = jnp.asarray((flat_q % C).astype(np.int32))

    def k4(t, r, c, o):
        rb = jnp.broadcast_to(r[:][:, None], (R, C))
        rows = jnp.take_along_axis(t[:], rb, axis=0)      # [R,C] rows
        cb = jnp.broadcast_to(c[:][:, None], (R, C))
        sel = jnp.take_along_axis(rows, cb, axis=1)       # every lane = answer
        o[:] = sel[:, :1]

    bench("P4 composed gather 4096 q/call", lambda: pl.pallas_call(
        k4, out_shape=jax.ShapeDtypeStruct((R, 1), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 3,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(T, rq, cq), expq[:, None], count=R)

    # --- P5: same but big: 1M queries via grid over query blocks
    NQ = 1 << 20
    flat_qb = rng.integers(0, R * C, size=(NQ,)).astype(np.int32)
    expb = np.asarray(T).reshape(-1)[flat_qb]
    rqb = jnp.asarray((flat_qb // C).astype(np.int32))
    cqb = jnp.asarray((flat_qb % C).astype(np.int32))
    BQ = 4096

    def k5(t, r, c, o):
        rb = jnp.broadcast_to(r[:][:, None], (BQ, C))
        rows = jnp.take_along_axis(t[:], rb, axis=0)
        cb = jnp.broadcast_to(c[:][:, None], (BQ, C))
        o[:] = jnp.take_along_axis(rows, cb, axis=1)[:, :1]

    dt = bench("P5 composed gather 1M queries", lambda: pl.pallas_call(
        k5, out_shape=jax.ShapeDtypeStruct((NQ, 1), jnp.float32),
        grid=(NQ // BQ,),
        in_specs=[
            pl.BlockSpec((R, C), lambda q: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((BQ,), lambda q: (q,), memory_space=pltpu.VMEM),
            pl.BlockSpec((BQ,), lambda q: (q,), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((BQ, 1), lambda q: (q, 0), memory_space=pltpu.VMEM),
    )(T, rqb, cqb), expb[:, None], count=NQ)
    if dt:
        print(f"   => composed in-kernel gather {NQ/dt/1e9:.2f} G rows/s "
              f"(XLA reference: 0.09)", flush=True)

    # --- P6: bf16 variants of axis0/axis1 (hash tables could live as bf16)
    Tb = T.astype(jnp.bfloat16)
    bench("P6 axis0 depth-4096 bf16", lambda: pl.pallas_call(
        k1, out_shape=jax.ShapeDtypeStruct((R, C), jnp.bfloat16),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(Tb, jnp.asarray(i0)), exp1.astype(np.float32), count=R * C)


if __name__ == "__main__":
    main()
