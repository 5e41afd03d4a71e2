"""Model base class.

Behavioral spec: reference `nerfstudio/models/base_model.py:58-257` — the
Model owns fields/samplers/renderers, applies the collider before
`get_outputs`, and renders full images by chunking rays
(`get_outputs_for_camera_ray_bundle:178-206`).

Functional design: a Model here is a plain Python object holding flax module
definitions and *static* config; every compute method is pure in the params.
`init_params(rng)` returns the grouped param pytree whose top-level keys match
the reference's optimizer param groups (fields / proposal_networks /
camera_opt / ... ) so per-group optimizers and checkpoints line up 1:1.
"""

from dataclasses import dataclass, field as dataclass_field
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from nerfstudio_thermal_tpu.cameras.cameras import Cameras
from nerfstudio_thermal_tpu.cameras.rays import RayBundle


def crop_near_far(origins: jax.Array, directions: jax.Array, aabb: jax.Array):
    """Ray/AABB slab intersection for the viewer crop tool -> (nears, fars),
    fars clamped to nears on miss (renders as background). The near-zero
    clamp preserves the component's sign: replacing a tiny NEGATIVE
    direction with +eps would flip that axis's slab interval."""
    d_safe = jnp.where(
        directions >= 0.0,
        jnp.maximum(directions, 1e-10),
        jnp.minimum(directions, -1e-10),
    )
    inv = 1.0 / d_safe
    t1 = (aabb[0] - origins) * inv
    t2 = (aabb[1] - origins) * inv
    nears = jnp.maximum(jnp.max(jnp.minimum(t1, t2), axis=-1, keepdims=True), 0.0)
    fars = jnp.min(jnp.maximum(t1, t2), axis=-1, keepdims=True)
    return nears, jnp.maximum(fars, nears)


@dataclass
class ModelConfig:
    """Base model config (reference base_model.py:35-56)."""

    enable_collider: bool = True
    collider_near: float = 2.0
    collider_far: float = 6.0
    eval_num_rays_per_chunk: int = 4096


class Model:
    """Base functional model."""

    def __init__(
        self,
        config: ModelConfig,
        scene_aabb: np.ndarray,  # [2, 3]
        num_train_data: int,
        metadata: Optional[Dict[str, Any]] = None,
    ):
        self.config = config
        self.scene_aabb = np.asarray(scene_aabb, np.float32)
        self.num_train_data = num_train_data
        self.metadata = metadata or {}
        self.collider = None
        self.populate_modules()

    def populate_modules(self):
        raise NotImplementedError

    def init_params(self, rng: jax.Array) -> Dict[str, Any]:
        raise NotImplementedError

    def get_outputs(self, params, ray_bundle: RayBundle, *, train, rng, **kwargs):
        raise NotImplementedError

    # Optional auxiliary state carried in the TrainState (e.g. instant-ngp's
    # occupancy grid — the functional replacement for the reference's
    # stateful training callbacks, base_model.py:150-163).
    def init_extra_state(self):
        return None

    def update_extra_state(self, params, extra, step, rng):
        return extra

    def extra_forward_kwargs(self, extra) -> Dict[str, Any]:
        return {}

    def forward(self, params, ray_bundle: RayBundle, *, train=True, rng=None, **kwargs):
        """Collider + get_outputs (reference base_model.py:140-151)."""
        if self.collider is not None:
            ray_bundle = self.collider(ray_bundle, train=train)
        return self.get_outputs(params, ray_bundle, train=train, rng=rng, **kwargs)

    # ------------------------------------------------------------------
    # Full-image rendering (host-chunked; one compiled program per chunk
    # size — the TPU analogue of reference base_model.py:178-206).
    # ------------------------------------------------------------------

    def get_outputs_for_camera(
        self, params, cameras: Cameras, camera_index: int, rng=None,
        width: Optional[int] = None, height: Optional[int] = None,
        crop_aabb=None, include_per_sample: bool = False,
    ) -> Dict[str, np.ndarray]:
        """Render a full image from camera `camera_index` (eval path).

        crop_aabb: optional [2, 3] world-space box; rendering is restricted
        to ray segments inside it (the viewer crop / scene-box tool,
        reference viewer/control_panel.py crop controls). Rays that miss the
        box collapse to near == far and render as background.

        include_per_sample: also return per-sample outputs (e.g. densities,
        [h, w, S]) the way the reference get_outputs_for_camera_ray_bundle
        does (base_model.py:178-206). Off by default: at 1080p they are
        ~1.2 GB/frame of device->host traffic no image consumer reads."""
        h = int(height if height is not None else cameras.height[camera_index])
        w = int(width if width is not None else cameras.width[camera_index])
        outputs = self.render_camera_device(
            params, cameras, camera_index, width=w, height=h,
            crop_aabb=crop_aabb, include_per_sample=include_per_sample,
        )
        return {k: np.asarray(v).reshape(h, w, -1) for k, v in outputs.items()}

    def render_camera_device(
        self, params, cameras: Cameras, camera_index: int,
        width: Optional[int] = None, height: Optional[int] = None,
        crop_aabb=None, include_per_sample: bool = False,
    ) -> Dict[str, jax.Array]:
        """Full-frame render that stays entirely on device: pixel coords go
        in, per-ray output images come out as flat [h*w, C] device arrays.
        Ray generation, the optional crop, and every render chunk run inside
        ONE jitted program (ray gen in-jit mirrors the train step; the eager
        per-frame `generate_rays` this replaces cost ~70 s at 1080p through
        the axon tunnel). Callers fetch only what they display — the
        measured tunnel D2H bandwidth is ~17.5 MB/s, so device residency is
        the difference between 0.15 fps and 0.01 fps at 1080p."""
        h = int(height if height is not None else cameras.height[camera_index])
        w = int(width if width is not None else cameras.width[camera_index])
        chunk = self.config.eval_num_rays_per_chunk
        n = h * w
        pad = (-n) % chunk
        n_chunks = (n + pad) // chunk
        ys, xs = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
        coords = np.stack([ys, xs], -1).reshape(-1, 2).astype(np.float32) + 0.5
        if pad:
            coords = np.concatenate([coords, np.repeat(coords[-1:], pad, 0)], 0)
        coords = jnp.asarray(coords.reshape(n_chunks, chunk, 2))
        idx = jnp.full((n_chunks, chunk), camera_index, jnp.int32)

        has_crop = crop_aabb is not None
        cache = getattr(self, "_render_camera_jit", None)
        if cache is None:
            cache = self._render_camera_jit = {}
        key = (has_crop, include_per_sample)
        if key not in cache:
            def _render_frame(params, cams, idx_chunks, coords_chunks, aabb):
                def body(args):
                    idx_c, coords_c = args
                    bundle = cams.generate_rays(idx_c, coords_c)
                    if aabb is not None:
                        nears, fars = crop_near_far(
                            bundle.origins, bundle.directions, aabb
                        )
                        bundle = bundle.replace(nears=nears, fars=fars)
                    out = self.forward(params, bundle, train=False, rng=None)
                    # Per-sample tensors (density fields, [chunk, S, 1]) are
                    # loss-path payload the image path never consumes; at
                    # 1080p they are ~1.2 GB/frame. The reference keeps them
                    # as never-fetched GPU residents (base_model.py:178-206);
                    # here, by default, they must not even be stacked —
                    # include_per_sample=True opts back into reference parity
                    # (ns-render --rendered-output-names density). The
                    # hasattr guard drops non-array outputs (e.g. list-valued
                    # entries a fused train path emits) instead of crashing
                    # at trace time.
                    keep = (2,) if not include_per_sample else (2, 3)
                    return {
                        k: v for k, v in out.items()
                        if hasattr(v, "ndim") and v.ndim in keep
                    }

                return jax.lax.map(body, (idx_chunks, coords_chunks))

            if has_crop:
                cache[key] = jax.jit(_render_frame)
            else:
                cache[key] = jax.jit(
                    lambda p, c, i, x: _render_frame(p, c, i, x, None)
                )
        if has_crop:
            aabb = jnp.asarray(np.asarray(crop_aabb, np.float32).reshape(2, 3))
            outs = cache[key](params, cameras, idx, coords, aabb)
        else:
            outs = cache[key](params, cameras, idx, coords)
        return jax.tree.map(
            lambda x: x.reshape((n_chunks * chunk,) + x.shape[2:])[:n], outs
        )

    def render_ray_bundle_chunked(
        self, params, bundle: RayBundle, rng=None
    ) -> Dict[str, jax.Array]:
        """Chunk a flat ray bundle and render every chunk inside ONE compiled
        program (`lax.map` == a scan over [n_chunks, chunk, ...] rays), so a
        full frame costs a single device dispatch. The per-chunk host loop
        this replaces paid the ~25 ms axon-tunnel dispatch latency once per
        chunk per pytree leaf (507 chunks at 1080p -> ~78 s/frame, measured
        2026-08-20); chunking remains an implementation detail that must not
        change values (reference base_model.py:178-206). The last chunk is
        padded to keep shapes static; one program is compiled per distinct
        (chunk, n_chunks), so fixed-resolution eval/viewer buckets reuse it."""
        chunk = self.config.eval_num_rays_per_chunk
        n = bundle.origins.shape[0]
        pad = (-n) % chunk
        n_chunks = (n + pad) // chunk
        if not hasattr(self, "_render_scan_jit"):
            def _render_all(params, chunks):
                def body(b):
                    out = self.forward(params, b, train=False, rng=None)
                    # image-path outputs only — see render_camera_device
                    return {k: v for k, v in out.items() if v.ndim == 2}

                return jax.lax.map(body, chunks)

            self._render_scan_jit = jax.jit(_render_all)

        padded = jax.tree.map(
            lambda x: jnp.concatenate([x, jnp.repeat(x[-1:], pad, axis=0)], axis=0)
            if pad
            else x,
            bundle,
        )
        chunks = jax.tree.map(
            lambda x: x.reshape((n_chunks, chunk) + x.shape[1:]), padded
        )
        outs = self._render_scan_jit(params, chunks)
        return jax.tree.map(
            lambda x: x.reshape((n_chunks * chunk,) + x.shape[2:])[:n], outs
        )
