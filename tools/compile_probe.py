"""Compile-time probes for TPU program components (dev tool)."""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

from nerfstudio_thermal_tpu.ops.encodings import hash_encode, hash_grid_scalings

which = sys.argv[1] if len(sys.argv) > 1 else "hash"
N = 8192 * 256  # biggest proposal level point count

if which == "hash":
    L, T, F = 5, 2**17, 2
    table = jnp.zeros((L * T, F))
    scal = jnp.asarray(hash_grid_scalings(L, 16, 128))
    pos = jax.random.uniform(jax.random.PRNGKey(0), (N, 3))

    def loss(t, p):
        return jnp.sum(hash_encode(t, p, scal, T, jnp.bfloat16).astype(jnp.float32))

    t0 = time.perf_counter()
    f = jax.jit(jax.grad(loss, argnums=(0, 1))).lower(table, pos).compile()
    print("hash fwd+bwd compile:", time.perf_counter() - t0, "s")
    t0 = time.perf_counter()
    jax.block_until_ready(f(table, pos))
    print("run:", time.perf_counter() - t0)
elif which == "prop":
    from nerfstudio_thermal_tpu.fields.density_fields import HashMLPDensityField

    aabb = ((-1, -1, -1), (1, 1, 1))
    net = HashMLPDensityField(
        aabb=aabb, hidden_dim=16, log2_hashmap_size=17, num_levels=5,
        max_res=128, compute_dtype=jnp.bfloat16,
    )
    pos = jax.random.uniform(jax.random.PRNGKey(0), (8192, 256, 3)) * 2 - 1
    params = net.init(jax.random.PRNGKey(1), pos[:2, :2])

    def loss(p, x):
        return jnp.sum(net.apply(p, x))

    t0 = time.perf_counter()
    f = jax.jit(jax.grad(loss)).lower(params, pos).compile()
    print("prop-net fwd+bwd compile:", time.perf_counter() - t0, "s")
    t0 = time.perf_counter()
    jax.block_until_ready(f(params, pos))
    print("run:", time.perf_counter() - t0)
elif which == "sampler":
    from nerfstudio_thermal_tpu.cameras.rays import RayBundle
    from nerfstudio_thermal_tpu.model_components.ray_samplers import proposal_sample

    R = 8192
    rb = RayBundle(
        origins=jnp.zeros((R, 3)),
        directions=jnp.ones((R, 3)) / jnp.sqrt(3.0),
        pixel_area=jnp.ones((R, 1)),
        camera_indices=jnp.zeros((R, 1), jnp.int32),
        nears=jnp.full((R, 1), 0.05),
        fars=jnp.full((R, 1), 1000.0),
    )

    def run(key):
        def dens(p):
            return jnp.sum(p, -1, keepdims=True) * 0 + 0.5

        rs, wl, sl = proposal_sample(
            rb, [dens, dens], (256, 96), 48, rng=key, train=True
        )
        return jnp.sum(rs.starts) + sum(jnp.sum(w) for w in wl)

    t0 = time.perf_counter()
    f = jax.jit(jax.grad(lambda k: run(k), argnums=())).lower(
        jax.random.PRNGKey(0)
    ).compile() if False else jax.jit(run).lower(jax.random.PRNGKey(0)).compile()
    print("sampler compile:", time.perf_counter() - t0, "s")
    t0 = time.perf_counter()
    jax.block_until_ready(f(jax.random.PRNGKey(0)))
    print("run:", time.perf_counter() - t0)
