"""Tile-binned gaussian-splat rasterization for TPU.

The role gsplat's CUDA tile rasterizer plays in the reference
(reference models/splatfacto.py:713-730, gsplat `rasterize_gaussians`):
instead of evaluating every gaussian at every pixel (the scan rasterizer in
models/splatfacto.py, O(H*W*N)), bin gaussians to fixed-capacity per-tile
lists and composite each tile against only its own list — O(H*W*K).

The design is TPU-first throughout; nothing here mirrors the CUDA kernel's
structure (per-tile shared-memory staging, warp ballots, atomic tail
blending). Everything is static-shape XLA, differentiable end to end:

- **Binning** is one masked depth `argsort` plus one *stable* int32 sort of
  the [N * window^2] (gaussian, candidate-tile) pairs laid out depth-major —
  stability makes every tile's segment depth-ordered for free, replacing
  gsplat's 64-bit (tile | depth) radix-sort key.
- **Segment starts** come from a chunked comparison-count
  (`sum(ids < t)` — the pattern CLAUDE.md documents as the fast replacement
  for scatter/searchsorted on v5e), not a scatter-add histogram.
- **Per-tile gather** is a fixed-capacity [T, K] row gather; truncation
  drops the *farthest* gaussians of an over-full tile (they are the
  lowest-transmittance contributors).
- **Compositing** runs as matmuls on the MXU: the front-to-back exclusive
  transmittance prod_{j<k}(1 - a_j) is exp of a log-space strictly-upper
  triangular matmul, and color/depth accumulation is a [P, K] @ [K, C]
  batched matmul. The per-chunk body is `jax.checkpoint`ed so the backward
  rematerializes [P, K] alpha tensors instead of storing them for every
  tile.

Numerically matches `models.splatfacto.rasterize` (same alpha clamp, 1/255
cull, background blend) up to summation order, whenever no tile overflows
`capacity` and no gaussian's 3.5-sigma box exceeds the `window`^2 candidate
tiles (the binning radius is 7/6 * the 3-sigma input radii, covering the
1/255 alpha support of any opacity <= 1).
"""

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
from jax import lax


def _count_below(ids: jax.Array, num_thresholds: int, chunk: int = 8192) -> jax.Array:
    """counts[t] = #(ids < t) for t in [0, num_thresholds), without scatter.

    Chunked compare-and-sum: v5e has no fast scatter-add histogram (measured
    ~0.09 G rows/s), but compare+reduce streams on the VPU."""
    m = ids.shape[0]
    pad = (-m) % chunk
    if pad:
        # pad value never counts: >= every threshold
        ids = jnp.concatenate(
            [ids, jnp.full((pad,), num_thresholds, ids.dtype)]
        )
    th = jnp.arange(num_thresholds, dtype=ids.dtype)
    chunks = ids.reshape(-1, chunk)

    def body(carry, ch):
        return (
            carry + jnp.sum(ch[:, None] < th[None, :], axis=0, dtype=jnp.int32),
            None,
        )

    counts, _ = lax.scan(body, jnp.zeros((num_thresholds,), jnp.int32), chunks)
    return counts


def bin_gaussians(
    xys: jax.Array,  # [N, 2] screen-space centers (stop-grad'd internally)
    depths: jax.Array,  # [N]
    radii: jax.Array,  # [N] 3-sigma pixel radii (0 = dead)
    valid: jax.Array,  # [N] bool
    H: int,
    W: int,
    tile_h: int,
    tile_w: int,
    capacity: int,
    window: int,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Fixed-capacity per-tile gaussian lists, front-to-back per tile.

    Returns (gauss_idx [T, K] int32 rows into the *depth-sorted* gaussian
    arrays, slot_mask [T, K] bool, order [N] the depth sort permutation).
    """
    n = xys.shape[0]
    tx_n = -(-W // tile_w)
    ty_n = -(-H // tile_h)
    num_tiles = tx_n * ty_n
    d = window * window

    order = jnp.argsort(jnp.where(valid, depths, jnp.inf))
    xy = lax.stop_gradient(xys)[order]
    rad = lax.stop_gradient(radii)[order]
    val = valid[order]

    # 7/6 * ceil(3 sigma) >= 3.5 sigma: covers alpha > 1/255 for opacity <= 1
    rb = jnp.ceil(rad * (7.0 / 6.0))
    x, y = xy[:, 0], xy[:, 1]
    x0 = jnp.floor((x - rb) / tile_w).astype(jnp.int32)
    x1 = jnp.floor((x + rb) / tile_w).astype(jnp.int32)
    y0 = jnp.floor((y - rb) / tile_h).astype(jnp.int32)
    y1 = jnp.floor((y + rb) / tile_h).astype(jnp.int32)
    # window^2 candidate tiles centered on the gaussian's own tile, clamped
    # into the bbox (big gaussians lose tiles beyond the window — see module
    # docstring)
    tcx = jnp.floor(x / tile_w).astype(jnp.int32)
    tcy = jnp.floor(y / tile_h).astype(jnp.int32)
    lox = jnp.clip(tcx - window // 2, x0, jnp.maximum(x0, x1 - window + 1))
    loy = jnp.clip(tcy - window // 2, y0, jnp.maximum(y0, y1 - window + 1))

    j = jnp.arange(d, dtype=jnp.int32)
    tx = lox[:, None] + (j % window)[None, :]  # [N, d]
    ty = loy[:, None] + (j // window)[None, :]
    ok = (
        val[:, None]
        & (tx >= 0) & (tx < tx_n) & (ty >= 0) & (ty < ty_n)
        & (tx <= x1[:, None]) & (ty <= y1[:, None])
    )
    tile_id = jnp.where(ok, ty * tx_n + tx, num_tiles).astype(jnp.int32)

    # depth-major layout + stable sort by tile == per-tile depth order
    flat = tile_id.reshape(-1)
    m = flat.shape[0]
    sorted_ids, cand = lax.sort(
        (flat, jnp.arange(m, dtype=jnp.int32)), num_keys=1, is_stable=True
    )

    starts = _count_below(sorted_ids, num_tiles + 1)
    k_iota = jnp.arange(capacity, dtype=jnp.int32)
    idx = starts[:-1, None] + k_iota[None, :]  # [T, K]
    slot_mask = idx < starts[1:, None]
    cand_tk = cand[jnp.clip(idx, 0, m - 1)]
    gauss_idx = cand_tk // d  # row into the depth-sorted arrays
    return gauss_idx, slot_mask, order


def rasterize_tiles(
    xys: jax.Array,
    depths: jax.Array,
    conics: jax.Array,
    radii: jax.Array,
    opacities: jax.Array,
    colors: jax.Array,
    alive: jax.Array,
    H: int,
    W: int,
    background: jax.Array,
    tile_h: int = 16,
    tile_w: int = 16,
    capacity: int = 512,
    window: int = 4,
    tiles_per_step: int = 16,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Tile-binned front-to-back compositing; same contract as
    `models.splatfacto.rasterize` -> (rgb [H,W,C], alpha [H,W,1], depth
    [H,W,1])."""
    num_ch = colors.shape[-1]
    tx_n = -(-W // tile_w)
    ty_n = -(-H // tile_h)
    num_tiles = tx_n * ty_n
    p = tile_h * tile_w

    valid = alive & (radii > 0)
    gauss_idx, slot_mask, order = bin_gaussians(
        xys, depths, radii, valid, H, W, tile_h, tile_w, capacity, window
    )

    # depth-sorted, differentiable feature rows [N, 2+3+1+C+1]
    opac = opacities * alive.astype(opacities.dtype)
    feats = jnp.concatenate(
        [xys, conics, opac[:, None], colors, depths[:, None]], axis=-1
    )[order]
    tile_feats = feats[gauss_idx]  # [T, K, F]

    pad_t = (-num_tiles) % tiles_per_step
    if pad_t:
        tile_feats = jnp.concatenate(
            [tile_feats, jnp.zeros((pad_t,) + tile_feats.shape[1:], feats.dtype)]
        )
        slot_mask = jnp.concatenate(
            [slot_mask, jnp.zeros((pad_t, capacity), bool)]
        )
    tile_ids = jnp.arange(num_tiles + pad_t, dtype=jnp.int32)

    # strictly-upper triangular ones: logT[p, k] = sum_{j < k} log(1 - a_j)
    upper = jnp.triu(jnp.ones((capacity, capacity), jnp.float32), k=1)

    # in-tile pixel offsets (row-major)
    px_off = (jnp.arange(p, dtype=jnp.float32) % tile_w) + 0.5
    py_off = (jnp.arange(p, dtype=jnp.float32) // tile_w) + 0.5

    @jax.checkpoint
    def body(carry, inp):
        tf, msk, tid = inp  # [TC, K, F], [TC, K], [TC]
        cx = tf[..., 0]
        cy = tf[..., 1]
        ca, cb, cc = tf[..., 2], tf[..., 3], tf[..., 4]
        copa = tf[..., 5]
        ccol = tf[..., 6 : 6 + num_ch]
        cdep = tf[..., 6 + num_ch]

        pixx = (tid % tx_n).astype(jnp.float32)[:, None] * tile_w + px_off[None, :]
        pixy = (tid // tx_n).astype(jnp.float32)[:, None] * tile_h + py_off[None, :]
        dx = pixx[:, :, None] - cx[:, None, :]  # [TC, P, K]
        dy = pixy[:, :, None] - cy[:, None, :]
        power = (
            -0.5 * (ca[:, None, :] * dx * dx + cc[:, None, :] * dy * dy)
            - cb[:, None, :] * dx * dy
        )
        alpha = jnp.minimum(
            0.999, copa[:, None, :] * jnp.exp(jnp.minimum(power, 0.0))
        )
        alpha = jnp.where(alpha > 1.0 / 255.0, alpha, 0.0)
        alpha = alpha * msk[:, None, :]
        log1m = jnp.log1p(-alpha)
        # HIGHEST precision: TPU DEFAULT rounds f32 operands to bf16; the
        # exclusive log-transmittance sums (magnitudes up to K * ~7) and
        # color weights must stay f32-exact to match the scan oracle
        hp = jax.lax.Precision.HIGHEST
        log_t = jnp.einsum("tpj,jk->tpk", log1m, upper, precision=hp)
        w = jnp.exp(log_t) * alpha  # [TC, P, K]
        rgb = jnp.einsum("tpk,tkc->tpc", w, ccol, precision=hp)
        dep = jnp.einsum("tpk,tk->tp", w, cdep, precision=hp)
        trans = jnp.exp(log_t[..., -1] + log1m[..., -1])  # full product
        return carry, (rgb, 1.0 - trans, dep, trans)

    chunks = (
        tile_feats.reshape(-1, tiles_per_step, capacity, tile_feats.shape[-1]),
        slot_mask.reshape(-1, tiles_per_step, capacity),
        tile_ids.reshape(-1, tiles_per_step),
    )
    _, (rgb, accum, dep, trans) = lax.scan(body, 0.0, chunks)

    def assemble(x, ch):
        # [n_chunks, TC, P(, ch)] -> [H, W, ch]
        x = x.reshape(-1, p, ch)[:num_tiles]
        x = x.reshape(ty_n, tx_n, tile_h, tile_w, ch)
        x = x.transpose(0, 2, 1, 3, 4).reshape(ty_n * tile_h, tx_n * tile_w, ch)
        return x[:H, :W]

    rgb = assemble(rgb, num_ch)
    accum = assemble(accum[..., None], 1)
    dep = assemble(dep[..., None], 1)
    trans = assemble(trans[..., None], 1)
    rgb = rgb + trans * background[None, None, :]
    dep = dep / jnp.maximum(accum, 1e-10)
    return rgb, accum, dep
