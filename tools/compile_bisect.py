"""Bisect which sub-graph of the hash encode compiles slowly (dev tool)."""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp

from nerfstudio_thermal_tpu.ops.encodings import (
    _CORNER_BITS,
    _corner_index,
    _corner_weight,
    _hash_factors,
    hash_grid_scalings,
)

L, T, F = 5, 2**17, 2
N = 8192 * 256
scal = jnp.asarray(hash_grid_scalings(L, 16, 128))
pos = jax.random.uniform(jax.random.PRNGKey(0), (N, 3))
table = jnp.zeros((L * T, F))
g = jnp.ones((N, L * F))


def ctime(name, fn, *args):
    t0 = time.perf_counter()
    compiled = jax.jit(fn).lower(*args).compile()
    dt_c = time.perf_counter() - t0
    t0 = time.perf_counter()
    jax.block_until_ready(compiled(*args))
    dt_r = time.perf_counter() - t0
    print(f"{name}: compile {dt_c:.1f}s run {dt_r*1e3:.1f}ms", flush=True)
    return compiled


# (a) hash factors alone
def factors(p):
    dim_f, dim_c, w_f, w_c = _hash_factors(p, scal, T)
    return sum(x.astype(jnp.int32).sum() for x in dim_f + dim_c) + sum(
        x.sum() for x in w_f + w_c
    )

ctime("factors", factors, pos)


# (b) uint32 multiply alone
def umul(p):
    x = jnp.floor(p[:, 0][None, :] * scal[:, None]).astype(jnp.int32)
    return (x.astype(jnp.uint32) * jnp.uint32(2654435761)).astype(jnp.int32).sum()

ctime("uint32 mul", umul, pos)


# (c) one corner: index + gather + weight (fwd single corner)
def one_corner(t, p):
    dim_f, dim_c, w_f, w_c = _hash_factors(p, scal, T)
    lo = (jnp.arange(L, dtype=jnp.int32) * T)[:, None]
    idx = _corner_index(dim_f, dim_c, _CORNER_BITS[0], T, lo)
    w = _corner_weight(w_f, w_c, _CORNER_BITS[0])
    return jnp.sum(t[:, 0].astype(jnp.float32)[idx] * w)

ctime("one corner fwd", one_corner, table, pos)


# (d) one corner scatter (bwd single corner, single col)
def one_scatter(t, p):
    dim_f, dim_c, w_f, w_c = _hash_factors(p, scal, T)
    lo = (jnp.arange(L, dtype=jnp.int32) * T)[:, None]
    idx = _corner_index(dim_f, dim_c, _CORNER_BITS[0], T, lo)
    w = _corner_weight(w_f, w_c, _CORNER_BITS[0])
    d = jnp.zeros((L * T,)).at[idx.reshape(-1)].add(w.reshape(-1))
    return d.sum()

ctime("one corner scatter", one_scatter, table, pos)


# (e) 8 corners fwd (the fwd impl)
from nerfstudio_thermal_tpu.ops.encodings import _hash_encode_fwd_impl

def fwd8(t, p):
    return jnp.sum(_hash_encode_fwd_impl(t, p, scal, T, jnp.bfloat16).astype(jnp.float32))

ctime("fwd 8 corners", fwd8, table, pos)


# (f) bwd impl alone
from nerfstudio_thermal_tpu.ops.encodings import _hash_encode_bwd

def bwd(t, p, gg):
    dt, dp, _ = _hash_encode_bwd(T, jnp.bfloat16, (t, p, scal), gg)
    return dt.sum() + dp.sum()

ctime("bwd 8 corners", bwd, table, pos, g)
