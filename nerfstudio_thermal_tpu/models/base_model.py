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
        crop_aabb=None,
    ) -> Dict[str, np.ndarray]:
        """Render a full image from camera `camera_index` (eval path).

        crop_aabb: optional [2, 3] world-space box; rendering is restricted
        to ray segments inside it (the viewer crop / scene-box tool,
        reference viewer/control_panel.py crop controls). Rays that miss the
        box collapse to near == far and render as background."""
        h = int(height if height is not None else cameras.height[camera_index])
        w = int(width if width is not None else cameras.width[camera_index])
        ys, xs = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
        coords = jnp.asarray(
            np.stack([ys, xs], -1).reshape(-1, 2).astype(np.float32) + 0.5
        )
        idx = jnp.full((coords.shape[0],), camera_index, jnp.int32)
        bundle = cameras.generate_rays(idx, coords)
        if crop_aabb is not None:
            aabb = jnp.asarray(np.asarray(crop_aabb, np.float32).reshape(2, 3))
            nears, fars = crop_near_far(bundle.origins, bundle.directions, aabb)
            bundle = bundle.replace(nears=nears, fars=fars)
        outputs = self.render_ray_bundle_chunked(params, bundle, rng=rng)
        return {k: np.asarray(v).reshape(h, w, -1) for k, v in outputs.items()}

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
                return jax.lax.map(
                    lambda b: self.forward(params, b, train=False, rng=None),
                    chunks,
                )

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
