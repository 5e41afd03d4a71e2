"""A/B the scan vs tile-binned splat rasterizers on live TPU.

Usage: python tools/bench_splat_raster.py [N] [H] [W]
Times forward and forward+backward of both rasterizers on a random scene
(N gaussians at HxW). Flip SplatfactoModelConfig.rasterizer to "tiles" if
the tile path wins end to end.
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

from nerfstudio_thermal_tpu.models.splatfacto import rasterize  # noqa: E402
from nerfstudio_thermal_tpu.ops.splat_tiles import rasterize_tiles  # noqa: E402


def scene(n, h, w, seed=0):
    r = np.random.default_rng(seed)
    xys = jnp.asarray(r.uniform([-8, -8], [w + 8, h + 8], (n, 2)).astype(np.float32))
    depths = jnp.asarray(r.uniform(0.5, 8.0, n).astype(np.float32))
    sig = r.uniform(0.8, 4.0, n).astype(np.float32)
    conic = np.zeros((n, 3), np.float32)
    conic[:, 0] = 1.0 / sig**2
    conic[:, 2] = 1.0 / sig**2
    radii = jnp.asarray(np.ceil(3.0 * sig))
    opac = jnp.asarray(r.uniform(0.05, 0.9, n).astype(np.float32))
    colors = jnp.asarray(r.uniform(0, 1, (n, 3)).astype(np.float32))
    alive = jnp.ones((n,), bool)
    bg = jnp.zeros((3,), jnp.float32)
    return xys, depths, jnp.asarray(conic), radii, opac, colors, alive, bg


def timed(fn, *args, reps=5):
    out = fn(*args)
    float(jax.tree.leaves(out)[0].sum())  # sync (tunnel-safe)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    float(jax.tree.leaves(out)[0].sum())
    return (time.perf_counter() - t0) / reps * 1e3


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    h = int(sys.argv[2]) if len(sys.argv) > 2 else 480
    w = int(sys.argv[3]) if len(sys.argv) > 3 else 640
    xys, depths, conic, radii, opac, colors, alive, bg = scene(n, h, w)

    scan_fn = jax.jit(
        lambda *a: rasterize(*a, h, w, bg, chunk=256)
    )
    tile_fn = jax.jit(
        lambda *a: rasterize_tiles(*a, h, w, bg, capacity=512, window=4)
    )

    def loss(fn):
        def f(xys, opac, colors):
            rgb, acc, dep = fn(xys, depths, conic, radii, opac, colors, alive)
            return jnp.sum(rgb) + jnp.sum(acc)
        return jax.jit(jax.grad(f, argnums=(0, 1, 2)))

    args7 = (xys, depths, conic, radii, opac, colors, alive)
    for name, fwd in (("scan", scan_fn), ("tiles", tile_fn)):
        t_f = timed(fwd, *args7)
        t_b = timed(loss(lambda *a: fwd(*a)), xys, opac, colors)
        print(f"{name:6s} N={n} {h}x{w}: fwd {t_f:8.2f} ms   fwd+bwd {t_b:8.2f} ms")


if __name__ == "__main__":
    main()
