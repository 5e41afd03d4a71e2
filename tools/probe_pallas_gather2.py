"""Probe 2: range limits + real throughput of tpu.dynamic_gather axis-1.

If axis-1 (lane) dynamic_gather supports index ranges beyond one 128-lane
tile, a 2^19 hash table stored as [S, T] rows (replicated or partitioned)
turns ANY gather into one in-kernel vector op. All calls jit-wrapped for
honest timing (probe 1 re-traced every call).
"""

import functools
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    print("device:", jax.devices()[0], flush=True)
    rng = np.random.default_rng(0)

    def bench(name, fn, *args, check=None, reps=10, count=None):
        try:
            jf = jax.jit(fn)
            out = jf(*args)
            err = -1.0
            if check is not None:
                err = float(np.max(np.abs(np.asarray(out).astype(np.float32) - check)))
            t0 = time.perf_counter()
            for _ in range(reps):
                out = jf(*args)
            float(np.asarray(out).reshape(-1)[0])
            dt = (time.perf_counter() - t0) / reps
            extra = f"  {count/dt/1e9:6.2f} G/s" if count else ""
            print(f"{name}: OK err={err:.2e}  {dt*1e3:8.3f} ms{extra}", flush=True)
            return dt
        except Exception as e:
            first = (str(e).splitlines() or [repr(e)])[0]
            print(f"{name}: FAIL {type(e).__name__}: {first[:160]}", flush=True)
            return None

    def lane_gather_kernel(t, i, o):
        o[:] = jnp.take_along_axis(t[:], i[:], axis=1)

    # --- range sweep: operand [8, W], indices in [0, W)
    for W in [128, 1024, 8192, 65536]:
        S = 8
        tab = jnp.asarray(rng.normal(size=(S, W)).astype(np.float32))
        idx = np.asarray(rng.integers(0, W, size=(S, W)).astype(np.int32))
        exp = np.take_along_axis(np.asarray(tab), idx, axis=1)

        def run(tab, idx, S=S, W=W):
            return pl.pallas_call(
                lane_gather_kernel,
                out_shape=jax.ShapeDtypeStruct((S, W), jnp.float32),
                in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            )(tab, idx)

        bench(f"axis1 range W={W}", run, tab, jnp.asarray(idx),
              check=exp, count=S * W)

    # --- realistic: per-level table 2^19 as [8, 65536] with FULL-RANGE
    # indices (flat table partitioned row-major into 8 sublanes) would need
    # cross-sublane too. Instead: table replicated across sublanes at
    # [8, 2^16] covers a 2^16 level; for 2^19 try [8, 2^19] (16 MB -> too
    # big) or 1 sublane [1, 2^19]:
    for S, W in [(1, 524288), (2, 524288)]:
        try:
            tab = jnp.asarray(rng.normal(size=(S, W)).astype(np.float32))
            idx = np.asarray(rng.integers(0, W, size=(S, W)).astype(np.int32))
            exp = np.take_along_axis(np.asarray(tab), idx, axis=1)

            def run(tab, idx, S=S, W=W):
                return pl.pallas_call(
                    lane_gather_kernel,
                    out_shape=jax.ShapeDtypeStruct((S, W), jnp.float32),
                    in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
                    out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
                )(tab, idx)

            bench(f"axis1 [S={S}, 2^19]", run, tab, jnp.asarray(idx),
                  check=exp, count=S * W)
        except Exception as e:
            print(f"axis1 [S={S},2^19] setup FAIL: {e}", flush=True)

    # --- throughput shape: many queries against a replicated [8, 65536]
    # table: grid over query blocks, 64 blocks x [8, 65536] queries
    W = 65536
    tab = jnp.asarray(rng.normal(size=(8, W)).astype(np.float32))
    NQ = 8 * W * 8  # 4.2M queries
    idxq = np.asarray(rng.integers(0, W, size=(NQ,)).astype(np.int32))
    exp = np.asarray(tab)[0][idxq]
    tab1 = jnp.asarray(np.broadcast_to(np.asarray(tab)[0], (8, W)).copy())

    def run_grid(tab, idx):
        B = 8 * W

        def kern(t, i, o):
            o[:] = jnp.take_along_axis(t[:], i[:], axis=1)

        return pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((NQ // B, 8, W), jnp.float32),
            grid=(NQ // B,),
            in_specs=[
                pl.BlockSpec((8, W), lambda q: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 8, W), lambda q: (q, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, 8, W), lambda q: (q, 0, 0),
                                   memory_space=pltpu.VMEM),
        )(tab, idx)

    # block spec with leading singleton may not collapse; fall back to 2D
    def run_grid2(tab, idx2d):
        def kern(t, i, o):
            o[:] = jnp.take_along_axis(t[:], i[:], axis=1)

        NB = idx2d.shape[0] // 8
        return pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct(idx2d.shape, jnp.float32),
            grid=(NB,),
            in_specs=[
                pl.BlockSpec((8, W), lambda q: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((8, W), lambda q: (q, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((8, W), lambda q: (q, 0),
                                   memory_space=pltpu.VMEM),
        )(tab, idx2d)

    idx2d = jnp.asarray(idxq.reshape(-1, W))
    bench("grid gather 4.2M q vs 2^16 table", run_grid2, tab1, idx2d,
          check=exp.reshape(-1, W), count=NQ)

    # --- bf16 table variant
    tabb = tab1.astype(jnp.bfloat16)

    def run_grid2_bf(tab, idx2d):
        def kern(t, i, o):
            o[:] = jnp.take_along_axis(t[:], i[:], axis=1)

        NB = idx2d.shape[0] // 8
        return pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct(idx2d.shape, jnp.bfloat16),
            grid=(NB,),
            in_specs=[
                pl.BlockSpec((8, W), lambda q: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((8, W), lambda q: (q, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((8, W), lambda q: (q, 0),
                                   memory_space=pltpu.VMEM),
        )(tab, idx2d)

    bench("grid gather bf16 4.2M q", run_grid2_bf, tabb, idx2d,
          check=exp.reshape(-1, W), count=NQ)


if __name__ == "__main__":
    main()
