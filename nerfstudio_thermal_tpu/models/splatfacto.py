"""Splatfacto: 3D Gaussian Splatting (nerfstudio's splatfacto) for TPU.

Behavioral spec: reference `nerfstudio/models/splatfacto.py:104-958` — config
surface :104-169, SFM/random gaussian init :187-243, EWA projection +
rasterization (gsplat CUDA in the reference), L1+SSIM loss :822-866,
densify/split/dup/cull refinement :367-576, opacity reset, SH degree
schedule.

TPU design (the gsplat CUDA rasterizer has no XLA analogue, so this is a
ground-up design):
- Gaussians live in FIXED-CAPACITY arrays (static shapes under jit) with an
  `alive` mask carried in the model extra state; refinement edits happen on
  the HOST every `refine_every` steps (splitting/duplicating into dead slots,
  culling by clearing the mask, resetting the affected Adam moments) — the
  jitted step never changes shape.
- Rasterization is one XLA program: project all gaussians (EWA: J W cov3d
  W^T J^T + 0.3 I screen blur), argsort by depth once per image, then a
  `lax.scan` over depth-ordered CHUNKS; each chunk computes its [pixels,
  chunk] alpha matrix and composites with an in-chunk exclusive cumprod and
  a carried per-pixel transmittance — mathematically identical to
  front-to-back alpha blending, with MXU/VPU-friendly dense shapes. Tile
  culling is a future lever; chunked scan bounds memory to
  [H*W, chunk_size].
- The densification signal is the accumulated norm of the loss gradient
  w.r.t. means (3D) rather than the reference's screen-space xys gradient
  (gsplat exposes those inside its kernel); the threshold is scaled by the
  camera focal/depth at refinement time to approximate the screen-space
  criterion.
"""

from dataclasses import dataclass, field as dataclass_field
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from nerfstudio_thermal_tpu.cameras.cameras import Cameras
from nerfstudio_thermal_tpu.models.base_model import Model, ModelConfig
from nerfstudio_thermal_tpu.ops.splat_compose import composite_chunks
from nerfstudio_thermal_tpu.utils.math import psnr, ssim


@dataclass
class SplatfactoModelConfig(ModelConfig):
    """(reference splatfacto.py:104-169)."""

    warmup_length: int = 500
    refine_every: int = 100
    resolution_schedule: int = 250
    background_color: str = "random"  # random | black | white
    num_downscales: int = 0
    cull_alpha_thresh: float = 0.1
    cull_scale_thresh: float = 0.5
    continue_cull_post_densification: bool = True
    reset_alpha_every: int = 30
    densify_grad_thresh: float = 0.0002
    densify_size_thresh: float = 0.01
    n_split_samples: int = 2
    sh_degree_interval: int = 1000
    cull_screen_size: float = 0.15
    split_screen_size: float = 0.05
    stop_screen_size_at: int = 4000
    random_init: bool = False
    num_random: int = 50000
    random_scale: float = 10.0
    ssim_lambda: float = 0.2
    stop_split_at: int = 15000
    sh_degree: int = 3
    use_scale_regularization: bool = False
    max_gauss_ratio: float = 10.0
    rasterize_mode: str = "classic"  # classic | antialiased
    max_num_gaussians: int = 300000
    """Fixed gaussian capacity (TPU static shapes; dead slots are masked)."""
    rasterize_chunk: int = 256
    """Gaussians composited per scan step (memory = H*W*chunk floats)."""
    rasterizer: str = "tiles"  # scan | tiles
    """"tiles" (default): tile-binned fixed-capacity lists + MXU log-space
    compositing (ops/splat_tiles.py, O(H*W*K)) — the gsplat-rasterizer
    analogue; equivalence-tested against scan. "scan": every gaussian
    against every pixel (O(H*W*N), the oracle baseline). Measured on v5e
    (tools/bench_splat_raster.py, 100k gaussians at 480x640): tiles 25.0 ms
    fwd / 46.1 ms fwd+bwd vs scan 5587 / 11739 ms — 223x/255x."""
    tile_capacity: int = 512
    """Max gaussians composited per 16x16 tile (tiles mode); over-full
    tiles drop the farthest."""
    tile_window: int = 4
    """Candidate-tile window per gaussian (tiles mode): covers up to a
    (window*16)^2 px footprint."""
    enable_collider: bool = False


# ---------------------------------------------------------------------------
# math helpers
# ---------------------------------------------------------------------------

def quat_to_rotmat(q: jax.Array) -> jax.Array:
    """[N, 4] (wxyz) -> [N, 3, 3]."""
    q = q / jnp.maximum(jnp.linalg.norm(q, axis=-1, keepdims=True), 1e-12)
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    return jnp.stack(
        [
            jnp.stack([1 - 2 * (y**2 + z**2), 2 * (x * y - w * z), 2 * (x * z + w * y)], -1),
            jnp.stack([2 * (x * y + w * z), 1 - 2 * (x**2 + z**2), 2 * (y * z - w * x)], -1),
            jnp.stack([2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x**2 + y**2)], -1),
        ],
        -2,
    )


def sh_basis(degree: int, dirs: jax.Array) -> jax.Array:
    """Real SH basis values up to `degree` for unit dirs [..., 3] ->
    [..., (degree+1)^2] (same convention as gsplat / reference SH colors)."""
    x, y, z = dirs[..., 0], dirs[..., 1], dirs[..., 2]
    out = [jnp.full(x.shape, 0.28209479177387814)]
    if degree >= 1:
        out += [-0.4886025119029199 * y, 0.4886025119029199 * z,
                -0.4886025119029199 * x]
    if degree >= 2:
        xx, yy, zz, xy, yz, xz = x * x, y * y, z * z, x * y, y * z, x * z
        out += [
            1.0925484305920792 * xy,
            -1.0925484305920792 * yz,
            0.31539156525252005 * (2 * zz - xx - yy),
            -1.0925484305920792 * xz,
            0.5462742152960396 * (xx - yy),
        ]
    if degree >= 3:
        xx, yy, zz = x * x, y * y, z * z
        out += [
            -0.5900435899266435 * y * (3 * xx - yy),
            2.890611442640554 * x * y * z,
            -0.4570457994644658 * y * (4 * zz - xx - yy),
            0.3731763325901154 * z * (2 * zz - 3 * xx - 3 * yy),
            -0.4570457994644658 * x * (4 * zz - xx - yy),
            1.445305721320277 * z * (xx - yy),
            -0.5900435899266435 * x * (xx - 3 * yy),
        ]
    return jnp.stack(out, axis=-1)


def project_gaussians(
    means: jax.Array,  # [N, 3]
    scales: jax.Array,  # [N, 3] (already exp'd)
    quats: jax.Array,  # [N, 4]
    c2w: jax.Array,  # [3, 4] OpenGL (nerfstudio) convention
    fx, fy, cx, cy, W: int, H: int,
    rasterize_mode: str = "classic",
):
    """EWA splatting projection. Returns (xys [N,2], depths [N], conics
    [N,3] (a,b,c of inverse cov), radii [N], comp [N] opacity compensation)."""
    R_c2w = c2w[:3, :3]
    t_c2w = c2w[:3, 3]
    # world -> camera, then flip to +z forward / +y down pinhole frame
    flip = jnp.diag(jnp.asarray([1.0, -1.0, -1.0]))
    R_w2c = flip @ R_c2w.T
    t_w2c = -R_w2c @ t_c2w
    p_cam = means @ R_w2c.T + t_w2c  # [N, 3]
    z = p_cam[:, 2]
    z_safe = jnp.where(jnp.abs(z) < 1e-6, 1e-6, z)

    Rg = quat_to_rotmat(quats)  # [N, 3, 3]
    M = Rg * scales[:, None, :]  # R @ diag(s)
    cov3d = M @ jnp.swapaxes(M, -1, -2)  # [N, 3, 3]

    x, y = p_cam[:, 0], p_cam[:, 1]
    # perspective Jacobian [N, 2, 3]
    zero = jnp.zeros_like(z)
    J = jnp.stack(
        [
            jnp.stack([fx / z_safe, zero, -fx * x / z_safe**2], -1),
            jnp.stack([zero, fy / z_safe, -fy * y / z_safe**2], -1),
        ],
        -2,
    )
    T = J @ R_w2c[None]  # [N, 2, 3]
    cov2d = T @ cov3d @ jnp.swapaxes(T, -1, -2)  # [N, 2, 2]
    det_raw = (
        cov2d[:, 0, 0] * cov2d[:, 1, 1] - cov2d[:, 0, 1] * cov2d[:, 1, 0]
    )
    cov2d = cov2d + 0.3 * jnp.eye(2)[None]
    a, b, c = cov2d[:, 0, 0], cov2d[:, 0, 1], cov2d[:, 1, 1]
    det = a * c - b * b
    det_safe = jnp.where(det <= 0, 1e-6, det)
    conic = jnp.stack([c / det_safe, -b / det_safe, a / det_safe], -1)
    # antialiased mode: opacity compensation sqrt(det_raw/det) (gsplat)
    comp = (
        jnp.sqrt(jnp.maximum(det_raw, 1e-12) / det_safe)
        if rasterize_mode == "antialiased"
        else jnp.ones_like(det)
    )
    # 3-sigma screen radius from the larger eigenvalue
    mid = 0.5 * (a + c)
    lam1 = mid + jnp.sqrt(jnp.maximum(mid**2 - det_safe, 0.0))
    radius = jnp.ceil(3.0 * jnp.sqrt(jnp.maximum(lam1, 0.0)))

    xys = jnp.stack([fx * x / z_safe + cx, fy * y / z_safe + cy], -1)
    in_front = z > 0.01
    radius = jnp.where(in_front, radius, 0.0)
    return xys, z, conic, radius, comp


def rasterize(
    xys, depths, conics, radii, opacities, colors, alive,
    H: int, W: int, background: jax.Array, chunk: int = 256,
):
    """Front-to-back alpha compositing over depth-sorted gaussians.

    One argsort over N, then lax.scan over chunks: alpha matrix [H*W, chunk],
    in-chunk exclusive cumprod + carried transmittance. Returns (rgb [H,W,3],
    alpha [H,W,1], depth [H,W,1])."""
    N = xys.shape[0]
    order = jnp.argsort(jnp.where(alive & (radii > 0), depths, jnp.inf))
    xys = xys[order]
    conics = conics[order]
    radii = radii[order]
    opac = (opacities * alive.astype(opacities.dtype))[order]
    cols = colors[order]
    deps = depths[order]

    ys, xs = jnp.meshgrid(
        jnp.arange(H, dtype=jnp.float32) + 0.5,
        jnp.arange(W, dtype=jnp.float32) + 0.5,
        indexing="ij",
    )
    pix = jnp.stack([xs.reshape(-1), ys.reshape(-1)], -1)  # [P, 2]
    P = pix.shape[0]

    pad = (-N) % chunk
    if pad:
        xys = jnp.concatenate([xys, jnp.zeros((pad, 2))], 0)
        conics = jnp.concatenate([conics, jnp.ones((pad, 3))], 0)
        radii = jnp.concatenate([radii, jnp.zeros((pad,))], 0)
        opac = jnp.concatenate([opac, jnp.zeros((pad,))], 0)
        cols = jnp.concatenate([cols, jnp.zeros((pad, cols.shape[-1]))], 0)
        deps = jnp.concatenate([deps, jnp.full((pad,), 1e10)], 0)
    n_chunks = (N + pad) // chunk

    chunks = (
        xys.reshape(n_chunks, chunk, 2),
        conics.reshape(n_chunks, chunk, 3),
        radii.reshape(n_chunks, chunk),
        opac.reshape(n_chunks, chunk),
        cols.reshape(n_chunks, chunk, -1),
        deps.reshape(n_chunks, chunk),
    )

    # O(P)-residual custom-VJP compositor: autodiff of the naive scan
    # stores a [n_chunks, P, chunk] alpha residual (123 GB at 100k
    # gaussians x 480x640) — see ops/splat_compose.py.
    rgb, dep, trans = composite_chunks(pix, *chunks)
    accum = 1.0 - trans
    rgb = rgb + trans[:, None] * background[None, :]
    dep = dep / jnp.maximum(accum[:, None], 1e-10)
    return (
        rgb.reshape(H, W, -1),
        accum.reshape(H, W, 1),
        dep.reshape(H, W, 1),
    )


# ---------------------------------------------------------------------------


class SplatfactoModel(Model):
    """Functional splatfacto with fixed-capacity gaussian pools."""

    config: SplatfactoModelConfig
    is_rasterization = True  # trainer builds an image-based step

    def __init__(self, *args, seed_points=None, **kwargs):
        self.seed_points = seed_points
        super().__init__(*args, **kwargs)

    def populate_modules(self):
        self.collider = None

    @property
    def num_sh_bases(self) -> int:
        return (self.config.sh_degree + 1) ** 2

    def init_params(self, rng: jax.Array) -> Dict[str, Any]:
        """Param groups match the reference optimizer groups
        (reference splatfacto.py:245-262 via get_gaussian_param_groups)."""
        cfg = self.config
        cap = cfg.max_num_gaussians
        k1, k2, k3 = jax.random.split(rng, 3)
        if self.seed_points is not None and not cfg.random_init:
            pts, cols = self.seed_points
            n = min(len(pts), cap)
            means = np.zeros((cap, 3), np.float32)
            means[:n] = np.asarray(pts[:n], np.float32)
            dc = np.zeros((cap, 3), np.float32)
            dc[:n] = _rgb_to_sh(np.asarray(cols[:n], np.float32))
        else:
            n = min(cfg.num_random, cap)
            means = np.zeros((cap, 3), np.float32)
            means[:n] = np.asarray(
                (jax.random.uniform(k1, (n, 3)) - 0.5) * cfg.random_scale
            )
            dc = np.zeros((cap, 3), np.float32)
            dc[:n] = np.asarray(jax.random.uniform(k2, (n, 3)))
        self._num_init = n

        # init scales from mean 3-NN distance (reference :217-223); host-side
        d3 = _avg_knn_dist(means[:n])
        scales = np.full((cap, 3), -5.0, np.float32)
        scales[:n] = np.log(np.maximum(d3, 1e-6))[:, None]
        quats = np.zeros((cap, 4), np.float32)
        quats[:, 0] = 1.0
        opacities = np.full((cap,), _logit(0.1), np.float32)

        return {
            "xyz": jnp.asarray(means),
            "features_dc": jnp.asarray(dc),
            "features_rest": jnp.zeros((cap, self.num_sh_bases - 1, 3)),
            "opacities": jnp.asarray(opacities),
            "scales": jnp.asarray(scales),
            "quats": jnp.asarray(quats),
        }

    # --- extra state: alive mask + densification statistics --------------

    _host_alive = None

    def init_extra_state(self):
        cap = self.config.max_num_gaussians
        alive = jnp.zeros((cap,), bool).at[: self._num_init].set(True)
        self._host_alive = np.asarray(alive)
        return {
            "alive": alive,
            "grad_accum": jnp.zeros((cap,)),
            "grad_count": jnp.zeros((cap,)),
            "max_radii": jnp.zeros((cap,)),
            "step": jnp.asarray(0, jnp.int32),
        }

    def update_extra_state(self, params, extra, step, rng):
        return {**extra, "step": step}

    def track_refinement_stats(self, extra, grads, aux):
        """Accumulate per-gaussian mean-position grad norms + max screen
        radius (the reference accumulates screen-space xys grads inside
        gsplat, splatfacto.py:367-410)."""
        gnorm = jnp.linalg.norm(grads["xyz"], axis=-1)
        seen = aux["radii"] > 0
        return {
            **extra,
            "grad_accum": extra["grad_accum"] + jnp.where(seen, gnorm, 0.0),
            "grad_count": extra["grad_count"] + seen.astype(jnp.float32),
            "max_radii": jnp.maximum(
                extra["max_radii"], jnp.where(seen, aux["radii"], 0.0)
            ),
        }

    def extra_forward_kwargs(self, extra) -> Dict[str, Any]:
        return {"alive": extra["alive"]} if extra is not None else {}

    # --- rendering --------------------------------------------------------

    def render_camera(
        self, params, cameras: Cameras, camera_index, *, alive,
        train: bool = True, rng: Optional[jax.Array] = None,
        width: Optional[int] = None, height: Optional[int] = None,
        sh_degree: Optional[int] = None,
    ) -> Dict[str, jax.Array]:
        cfg = self.config
        i = camera_index
        # H/W must be static under jit: pass width/height explicitly when i
        # is traced (the trainer does; eval passes concrete ints)
        H = int(height) if height is not None else int(cameras.height[int(i)])
        W = int(width) if width is not None else int(cameras.width[int(i)])
        c2w = cameras.camera_to_worlds[i]
        fx, fy = cameras.fx[i], cameras.fy[i]
        cx, cy = cameras.cx[i], cameras.cy[i]

        means = params["xyz"]
        scales = jnp.exp(params["scales"])
        opac = jax.nn.sigmoid(params["opacities"])
        xys, depths, conics, radii, comp = project_gaussians(
            means, scales, params["quats"], c2w, fx, fy, cx, cy, W, H,
            rasterize_mode=cfg.rasterize_mode,
        )
        opac = opac * comp

        # SH colors from the camera center direction (reference :700-724)
        deg = cfg.sh_degree if sh_degree is None else sh_degree
        viewdir = means - c2w[:3, 3]
        viewdir = viewdir / jnp.maximum(
            jnp.linalg.norm(viewdir, axis=-1, keepdims=True), 1e-9
        )
        basis = sh_basis(deg, viewdir)  # [N, B_active]
        feats = jnp.concatenate(
            [params["features_dc"][:, None, :], params["features_rest"]], axis=1
        )  # [N, B_full, 3]
        n_active = (deg + 1) ** 2
        colors = jnp.einsum(
            "nb,nbc->nc", basis, feats[:, : basis.shape[-1], :][:, :n_active]
        )
        colors = jnp.clip(colors + 0.5, 0.0, None)

        if train and cfg.background_color == "random" and rng is not None:
            background = jax.random.uniform(rng, (3,))
        elif cfg.background_color == "white":
            background = jnp.ones((3,))
        else:
            background = jnp.zeros((3,))

        if cfg.rasterizer == "tiles":
            from nerfstudio_thermal_tpu.ops.splat_tiles import rasterize_tiles

            rgb, accum, depth = rasterize_tiles(
                xys, depths, conics, radii, opac, colors, alive, H, W,
                background, capacity=cfg.tile_capacity,
                window=cfg.tile_window,
            )
        else:
            rgb, accum, depth = rasterize(
                xys, depths, conics, radii, opac, colors, alive, H, W,
                background, chunk=cfg.rasterize_chunk,
            )
        return {
            "rgb": jnp.clip(rgb, 0.0, 1.0),
            "accumulation": accum,
            "depth": depth,
            "expected_depth": depth,
            "background": background,
            "radii": radii,
        }

    def get_outputs(self, params, camera_index=None, cameras=None, *,
                    train=True, rng=None, alive=None, **kwargs):
        assert cameras is not None
        return self.render_camera(
            params, cameras, camera_index, alive=alive, train=train, rng=rng
        )

    def get_outputs_for_camera(
        self, params, cameras: Cameras, camera_index: int, rng=None,
        width=None, height=None, extra=None,
    ) -> Dict[str, np.ndarray]:
        if extra is not None:
            alive = extra["alive"]
        elif getattr(self, "_host_alive", None) is not None:
            # snapshot kept in sync by the trainer (refinement changes it)
            alive = jnp.asarray(self._host_alive)
        else:
            alive = jnp.ones((self.config.max_num_gaussians,), bool)
        out = self.render_camera(
            params, jax.tree.map(jnp.asarray, cameras), camera_index,
            alive=alive, train=False, width=width, height=height,
        )
        return {
            k: np.asarray(v)
            for k, v in out.items()
            if k not in ("background", "radii")
        }

    def render_camera_device(
        self, params, cameras: Cameras, camera_index: int,
        width=None, height=None, crop_aabb=None, include_per_sample=False,
    ):
        """Splat renders whole frames natively (no ray chunking); return the
        [h, w, C] images as-is. crop_aabb is a ray-model concept (AABB
        near/far clamping) with no rasterizer analogue — ignored, as is
        include_per_sample (a rasterizer has no per-sample tensors)."""
        return self.get_outputs_for_camera(
            params, cameras, camera_index, width=width, height=height
        )

    # --- losses / metrics --------------------------------------------------

    def get_metrics_dict(self, params, outputs, batch, train: bool = True):
        gt = batch["image"][..., :3]
        return {"psnr": psnr(outputs["rgb"], gt)}

    def get_loss_dict(self, params, outputs, batch, metrics_dict, *, train=True, rng=None):
        """(reference splatfacto.py:822-866): L1 + ssim_lambda * (1-SSIM),
        optional scale regularization."""
        cfg = self.config
        gt = batch["image"][..., :3]
        pred = outputs["rgb"]
        l1 = jnp.mean(jnp.abs(gt - pred))
        simloss = 1.0 - ssim(pred, gt)
        loss = {
            "main_loss": (1.0 - cfg.ssim_lambda) * l1 + cfg.ssim_lambda * simloss
        }
        if train and cfg.use_scale_regularization:
            s = jnp.exp(params["scales"])
            ratio = jnp.maximum(
                s.max(-1) / jnp.maximum(s.min(-1), 1e-8),
                cfg.max_gauss_ratio,
            )
            loss["scale_reg"] = 0.1 * jnp.mean(ratio - cfg.max_gauss_ratio)
        return loss

    # --- host-side refinement ----------------------------------------------

    def wants_host_refinement(self, step: int) -> bool:
        cfg = self.config
        return (
            step > cfg.warmup_length
            and step % cfg.refine_every == 0
            and step < cfg.stop_split_at
        )

    def refine_host(self, params, opt_state, extra, step: int):
        """Densify (split/dup), cull, and periodically reset opacity —
        host-side numpy on the fixed-capacity pools
        (reference splatfacto.py:367-576). Returns updated pytrees."""
        cfg = self.config
        p = {k: np.array(v) for k, v in params.items()}  # writable copies
        alive = np.asarray(extra["alive"]).copy()
        count = np.maximum(np.asarray(extra["grad_count"]), 1.0)
        avg_grad = np.asarray(extra["grad_accum"]) / count

        scales = np.exp(p["scales"])
        max_scale = scales.max(-1)
        opac = 1 / (1 + np.exp(-p["opacities"]))

        # cull (reference :478-516)
        cull = alive & (opac < cfg.cull_alpha_thresh)
        if step > cfg.refine_every * cfg.reset_alpha_every:
            cull |= alive & (max_scale > cfg.cull_scale_thresh)
        alive &= ~cull

        # densify candidates (reference :418-476): high grad
        high_grad = avg_grad > cfg.densify_grad_thresh
        split = alive & high_grad & (max_scale > cfg.densify_size_thresh)
        dup = alive & high_grad & (max_scale <= cfg.densify_size_thresh)

        free = np.nonzero(~alive)[0]
        rng = np.random.default_rng(step)

        new_rows = {k: [] for k in p}
        # duplications: copy in place
        for idx in np.nonzero(dup)[0]:
            for k in p:
                new_rows[k].append(p[k][idx])
        # splits: n_split_samples new samples, shrink originals
        split_idx = np.nonzero(split)[0]
        for idx in split_idx:
            R = np.asarray(quat_to_rotmat(jnp.asarray(p["quats"][idx : idx + 1])))[0]
            s = scales[idx]
            for _ in range(cfg.n_split_samples):
                offset = R @ (rng.normal(size=3) * s)
                for k in p:
                    row = p[k][idx].copy()
                    if k == "xyz":
                        row = row + offset
                    if k == "scales":
                        row = np.log(np.maximum(s / 1.6, 1e-8))
                    new_rows[k].append(row)
        if len(split_idx):
            p["scales"][split_idx] = np.log(
                np.maximum(scales[split_idx] / 1.6, 1e-8)
            )

        n_new = len(new_rows["xyz"])
        n_fit = min(n_new, len(free))
        slots = free[:n_fit]
        for k in p:
            if n_fit:
                p[k][slots] = np.stack(new_rows[k][:n_fit])
        alive[slots] = True

        # periodic opacity reset (reference :556-576)
        reset_interval = cfg.reset_alpha_every * cfg.refine_every
        if step % reset_interval == 0 and step > 0:
            reset_val = _logit(min(2 * cfg.cull_alpha_thresh, 0.99))
            p["opacities"] = np.minimum(p["opacities"], reset_val).astype(
                np.float32
            )

        # zero Adam moments for touched slots (reference dup_in_optim :518-554)
        touched = np.zeros_like(alive)
        touched[slots] = True
        touched |= cull
        new_opt = _reset_adam_slots(opt_state, touched)

        new_extra = {
            **{k: jnp.asarray(v) for k, v in extra.items()},
            "alive": jnp.asarray(alive),
            "grad_accum": jnp.zeros_like(extra["grad_accum"]),
            "grad_count": jnp.zeros_like(extra["grad_count"]),
            "max_radii": jnp.zeros_like(extra["max_radii"]),
        }
        return (
            {k: jnp.asarray(v) for k, v in p.items()},
            new_opt,
            new_extra,
        )


def _rgb_to_sh(rgb: np.ndarray) -> np.ndarray:
    return (rgb - 0.5) / 0.28209479177387814


def _logit(x: float) -> float:
    return float(np.log(x / (1 - x)))


def _avg_knn_dist(pts: np.ndarray, k: int = 3, sample: int = 4096) -> np.ndarray:
    """Mean distance to the k nearest of a subsample (reference uses
    full k-NN via torch cdist, splatfacto.py:217-223)."""
    n = len(pts)
    if n <= 1:
        return np.full((n,), 0.1, np.float32)
    ref = pts[np.random.default_rng(0).choice(n, min(n, sample), replace=False)]
    d = np.linalg.norm(pts[:, None, :] - ref[None, :, :], axis=-1)
    d.sort(axis=1)
    kk = min(k + 1, d.shape[1])
    return d[:, 1:kk].mean(axis=1).astype(np.float32)


def _reset_adam_slots(opt_state, touched_mask: np.ndarray):
    """Zero first/second moments at refreshed gaussian slots for every param
    leaf whose leading dim matches the capacity."""
    cap = len(touched_mask)
    mask = jnp.asarray(touched_mask)

    def zero_rows(x):
        if hasattr(x, "shape") and x.ndim >= 1 and x.shape[0] == cap:
            shape = (cap,) + (1,) * (x.ndim - 1)
            return x * (~mask).reshape(shape).astype(x.dtype)
        return x

    return jax.tree.map(zero_rows, opt_state)
