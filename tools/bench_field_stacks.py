"""Microbench: field stacks (freq enc + MLP) fwd+bwd — Pallas vs XLA, by block."""

import time
import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from nerfstudio_thermal_tpu.ops.mlp import MLP

    rng = np.random.default_rng(0)

    def timeit(fn, *args, reps=10):
        out = fn(*args)
        jax.tree.leaves(out)[0].block_until_ready()
        float(np.asarray(jax.tree.leaves(out)[0]).reshape(-1)[0])
        t0 = time.perf_counter()
        for _ in range(reps):
            out = fn(*args)
        float(np.asarray(jax.tree.leaves(out)[0]).reshape(-1)[0])
        return (time.perf_counter() - t0) / reps

    CASES = [
        # (name, N, layers, width, out, skips, F)
        ("proposal", 2_097_152, 3, 64, 1, (), 5),
        ("base", 393_216, 8, 256, 16, (4,), 10),
    ]
    for name, n, layers, width, out_dim, skips, nf in CASES:
        x = jnp.asarray(rng.uniform(0, 1, (n, 3)).astype(np.float32))
        fe = (nf, 0.0, float(nf - 1), True)

        def build(fused, block=4096):
            m = MLP(num_layers=layers, layer_width=width, out_dim=out_dim,
                    skip_connections=skips, compute_dtype=jnp.bfloat16,
                    fused=fused, fused_block_size=block, freq_encoding=fe)
            p = m.init(jax.random.PRNGKey(0), x)
            def f(p, x):
                return jnp.sum(m.apply(p, x).astype(jnp.float32) ** 2)
            return p, jax.jit(jax.value_and_grad(f))

        p, g_xla = build(False)
        try:
            t = timeit(g_xla, p, x)
            print(f"{name} XLA: {t*1000:7.2f} ms")
        except Exception as e:
            print(f"{name} XLA failed: {str(e)[:100]}")

        for blk in (1024, 2048, 4096, 8192):
            p, g_pal = build(True, blk)
            try:
                t = timeit(g_pal, p, x)
                print(f"{name} pallas blk={blk}: {t*1000:7.2f} ms")
            except Exception as e:
                print(f"{name} pallas blk={blk} failed: {str(e)[:90]}")


if __name__ == "__main__":
    main()
