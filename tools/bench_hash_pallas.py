"""Real-TPU check + microbench: Pallas one-hot hash kernel vs XLA gather."""

import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from nerfstudio_thermal_tpu.ops.encodings import hash_encode, hash_grid_scalings
    from nerfstudio_thermal_tpu.ops.pallas.hash_encoding import hash_encode_pallas

    print("device:", jax.devices()[0])
    rng = np.random.default_rng(0)

    for log2_t, num_levels, n in [(10, 5, 2_000_000), (12, 5, 2_000_000)]:
        table_size = 2**log2_t
        table = jnp.asarray(
            rng.normal(size=(num_levels * table_size, 2)).astype(np.float32) * 1e-2
        )
        positions = jnp.asarray(rng.uniform(0, 1, (n, 3)).astype(np.float32))
        scalings = jnp.asarray(hash_grid_scalings(num_levels, 16, 256))

        def loss_p(tb, p):
            return jnp.sum(hash_encode_pallas(tb, p, scalings, table_size, jnp.bfloat16).astype(jnp.float32) ** 2)

        def loss_x(tb, p):
            return jnp.sum(hash_encode(tb, p, scalings, table_size, jnp.bfloat16).astype(jnp.float32) ** 2)

        for name, fn in [("pallas", loss_p), ("xla", loss_x)]:
            vg = jax.jit(jax.value_and_grad(fn, argnums=(0, 1)))
            try:
                (l, (gt, gp)) = vg(table, positions)
                float(l)
            except Exception as e:
                print(f"T=2^{log2_t} {name}: FAILED {type(e).__name__}: {e}")
                continue
            t0 = time.perf_counter()
            reps = 5
            for _ in range(reps):
                l, (gt, gp) = vg(table, positions)
            float(l)
            dt = (time.perf_counter() - t0) / reps
            print(
                f"T=2^{log2_t} L={num_levels} N={n}: {name} fwd+bwd {dt*1000:.1f} ms"
                f" ({n*num_levels*8/dt/1e9:.2f} G corner-lookups/s)"
            )

        # correctness spot-check vs XLA on a small slice
        out_p = hash_encode_pallas(table, positions[:1000], scalings, table_size, jnp.float32)
        out_x = hash_encode(table, positions[:1000], scalings, table_size, jnp.float32)
        err = float(jnp.max(jnp.abs(out_p - out_x)))
        print(f"  max |pallas - xla| on 1000 pts: {err:.2e}")


if __name__ == "__main__":
    main()
