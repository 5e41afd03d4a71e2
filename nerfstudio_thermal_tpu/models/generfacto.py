"""Generfacto: text-to-3D by score distillation over a nerfacto-style field.

Behavioral spec: reference `nerfstudio/models/generfacto.py:47-520` — random
spherical cameras, density blob initialization with tapering (:261-266,
:357-361), lambertian shading with a random light (:393-416), orientation +
opacity penalties (:427-437, :446-456), per-view positional prompting and an
SDS loss through the rendered image (:457-483), background MLP from ray
directions.

TPU design: one jitted step renders a full low-res image from a random
camera (pose arrays ride in the batch) and applies the SDS guidance; every
reference callback schedule (taper, normals start, lambertian start,
orientation ramp) is a traced function of `step` carried in the extra state.
Diffusion guidance is pluggable (generative/guidance.py): Stable Diffusion
is gated on local checkpoints; the ColorMatchGuidance exercises the whole
pipeline without weights.
"""

from dataclasses import dataclass, field as dataclass_field
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from nerfstudio_thermal_tpu.cameras.rays import RayBundle
from nerfstudio_thermal_tpu.fields.base_field import FieldHeadNames
from nerfstudio_thermal_tpu.fields.density_fields import HashMLPDensityField
from nerfstudio_thermal_tpu.fields.nerfacto_field import NerfactoField
from nerfstudio_thermal_tpu.model_components import renderers
from nerfstudio_thermal_tpu.model_components.losses import (
    distortion_loss,
    interlevel_loss,
    orientation_loss,
)
from nerfstudio_thermal_tpu.model_components.ray_samplers import proposal_sample
from nerfstudio_thermal_tpu.model_components.scene_colliders import SphereCollider
from nerfstudio_thermal_tpu.models.base_model import Model, ModelConfig
from nerfstudio_thermal_tpu.models.nerfacto import proposal_anneal
from nerfstudio_thermal_tpu.ops.encodings import NeRFEncoding
from nerfstudio_thermal_tpu.ops.mlp import MLP
from nerfstudio_thermal_tpu.utils.math import safe_normalize


@dataclass
class GenerfactoModelConfig(ModelConfig):
    """(reference generfacto.py:47-146)."""

    prompt: str = "a high quality photo of a ripe pineapple"
    background_color: str = "white"
    orientation_loss_mult: Tuple[float, float] = (0.001, 10.0)
    orientation_loss_mult_range: Tuple[int, int] = (0, 15000)
    random_light_source: bool = True
    initialize_density: bool = True
    taper_range: Tuple[int, int] = (0, 1000)
    taper_strength: Tuple[float, float] = (1.0, 0.0)
    sphere_collider: bool = True
    random_background: bool = True
    target_transmittance_start: float = 0.4
    target_transmittance_end: float = 0.7
    transmittance_end_schedule: int = 1500
    num_proposal_samples_per_ray: Tuple[int, ...] = (256, 96)
    num_nerf_samples_per_ray: int = 48
    num_proposal_iterations: int = 2
    proposal_net_args_list: List[Dict] = dataclass_field(
        default_factory=lambda: [
            {"hidden_dim": 16, "log2_hashmap_size": 17, "num_levels": 5, "max_res": 128},
            {"hidden_dim": 16, "log2_hashmap_size": 17, "num_levels": 5, "max_res": 256},
        ]
    )
    proposal_weights_anneal_slope: float = 10.0
    proposal_weights_anneal_max_num_iters: int = 500
    use_single_jitter: bool = True
    interlevel_loss_mult: float = 1.0
    distortion_loss_mult: float = 1.0
    start_normals_training: int = 1000
    start_lambertian_training: int = 1000
    opacity_penalty: bool = True
    opacity_loss_mult: float = 1.0
    max_res: int = 256
    top_prompt: str = ", overhead view"
    side_prompt: str = ", side view"
    front_prompt: str = ", front view"
    back_prompt: str = ", back view"
    guidance_scale: float = 20.0
    diffusion_model: str = "colormatch"  # colormatch | stablediffusion
    render_resolution: int = 64
    """Train-render side length (reference RandomCamerasDataManager)."""
    hidden_dim: int = 64
    num_levels: int = 12
    log2_hashmap_size: int = 19
    compute_dtype: str = "float32"
    enable_collider: bool = False


class GenerfactoModel(Model):
    """Functional generfacto."""

    config: GenerfactoModelConfig
    is_generative = True

    def populate_modules(self):
        cfg = self.config
        compute_dtype = jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else jnp.float32
        aabb = tuple(map(tuple, self.scene_aabb.tolist()))
        self.field = NerfactoField(
            aabb=aabb,
            num_images=1,
            hidden_dim=cfg.hidden_dim,
            num_levels=cfg.num_levels,
            max_res=cfg.max_res,
            log2_hashmap_size=cfg.log2_hashmap_size,
            appearance_embedding_dim=0,
            use_spatial_distortion=True,
            num_channels=3,
            compute_dtype=compute_dtype,
        )
        # background MLP over encoded ray directions
        # (reference generfacto_field.py:134-142)
        self.bg_encoding = NeRFEncoding(
            in_dim=3, num_frequencies=4, min_freq_exp=0.0, max_freq_exp=3.0,
            include_input=True,
        )
        self.bg_mlp = MLP(
            num_layers=2, layer_width=32, out_dim=3,
            out_activation=jax.nn.sigmoid, compute_dtype=compute_dtype,
        )
        self.proposal_networks = [
            HashMLPDensityField(
                aabb=aabb, use_spatial_distortion=True,
                **{k: v for k, v in args.items() if k != "use_linear"},
            )
            for args in cfg.proposal_net_args_list[: cfg.num_proposal_iterations]
        ]
        self.collider = (
            SphereCollider(center=(0.0, 0.0, 0.0), radius=1.0)
            if cfg.sphere_collider
            else None
        )
        self.guidance = None  # built lazily (may need external weights)

    def get_guidance(self):
        if self.guidance is None:
            from nerfstudio_thermal_tpu.generative.guidance import build_guidance

            self.guidance = build_guidance(
                self.config.diffusion_model,
                **(
                    {"guidance_scale": self.config.guidance_scale,
                     "sd_version": "1-5"}
                    if self.config.diffusion_model == "stablediffusion"
                    else {}
                ),
            )
            p = self.config.prompt
            self.prompt_embeddings = self.guidance.embed_prompts(
                p, p + self.config.top_prompt, p + self.config.side_prompt,
                p + self.config.front_prompt, p + self.config.back_prompt,
            )
        return self.guidance

    def init_params(self, rng: jax.Array) -> Dict[str, Any]:
        from nerfstudio_thermal_tpu.models.nerfacto import _dummy_ray_samples

        k1, k2, k3, k4 = jax.random.split(rng, 4)
        params: Dict[str, Any] = {
            "fields": self.field.init(k1, _dummy_ray_samples(), train=True)["params"]
        }
        params["field_background"] = self.bg_mlp.init(
            k2, jnp.zeros((2, self.bg_encoding.out_dim))
        )["params"]
        prop_keys = jax.random.split(k3, len(self.proposal_networks))
        params["proposal_networks"] = {
            str(i): net.init(k, ray_samples=_dummy_ray_samples())["params"]
            for i, (net, k) in enumerate(zip(self.proposal_networks, prop_keys))
        }
        return params

    def _density_fns(self, params):
        return [
            (lambda samples, net=net, p=params["proposal_networks"][str(i)]:
             net.apply({"params": p}, ray_samples=samples))
            for i, net in enumerate(self.proposal_networks)
        ]

    # schedules (reference callbacks :256-343) as traced functions of step
    def _taper(self, step):
        cfg = self.config
        t0, t1 = cfg.taper_range
        s0, s1 = cfg.taper_strength
        frac = jnp.clip((step - t0) / max(t1 - t0, 1), 0.0, 1.0)
        return s0 + (s1 - s0) * frac

    def _orientation_mult(self, step):
        cfg = self.config
        t0, t1 = cfg.orientation_loss_mult_range
        m0, m1 = cfg.orientation_loss_mult
        frac = jnp.clip((step - t0) / max(t1 - t0, 1), 0.0, 1.0)
        return m0 + (m1 - m0) * frac

    def generative_forward(
        self, params, batch, *, step, train: bool = True,
        rng: Optional[jax.Array] = None,
    ):
        """Render a full res x res image from the batch's random camera and
        compute every generfacto output (reference get_outputs :350-437)."""
        cfg = self.config
        res = cfg.render_resolution
        rng = rng if rng is not None else jax.random.PRNGKey(0)
        k_light, k_shade, k_bg, k_sample, k_choice = jax.random.split(rng, 5)

        c2w = batch["c2w"]  # [3, 4]
        focal = batch["focal"]  # scalar (pixels)
        ys, xs = jnp.meshgrid(
            jnp.arange(res, dtype=jnp.float32) + 0.5,
            jnp.arange(res, dtype=jnp.float32) + 0.5,
            indexing="ij",
        )
        dirs_cam = jnp.stack(
            [
                (xs - res / 2) / focal,
                -(ys - res / 2) / focal,
                -jnp.ones_like(xs),
            ],
            -1,
        ).reshape(-1, 3)
        dirs_cam = dirs_cam / jnp.linalg.norm(dirs_cam, axis=-1, keepdims=True)
        dirs = dirs_cam @ c2w[:3, :3].T
        origins = jnp.broadcast_to(c2w[:3, 3], dirs.shape)
        bundle = RayBundle(
            origins=origins,
            directions=dirs,
            pixel_area=jnp.full((res * res, 1), (1.0 / focal) ** 2),
            camera_indices=jnp.zeros((res * res, 1), jnp.int32),
        )
        if self.collider is not None:
            bundle = self.collider(bundle, train=train)

        anneal = proposal_anneal(
            step, cfg.proposal_weights_anneal_max_num_iters,
            cfg.proposal_weights_anneal_slope,
        )
        ray_samples, weights_list, ray_samples_list = proposal_sample(
            bundle,
            self._density_fns(params),
            num_proposal_samples_per_ray=cfg.num_proposal_samples_per_ray,
            num_nerf_samples_per_ray=cfg.num_nerf_samples_per_ray,
            initial_spacing_kind="uniform",
            single_jitter=cfg.use_single_jitter,
            anneal=anneal,
            updated=True,
            train=train,
            rng=k_sample,
        )

        # density with analytic normals (jax.grad of the summed density — each
        # sample independent, same trick as the SDF field)
        positions = ray_samples.get_positions()

        def density_at(pos):
            d, _ = self.field.apply(
                {"params": params["fields"]}, pos, method=self.field.get_density
            )
            return d

        density = density_at(positions)
        grad = jax.grad(lambda p: jnp.sum(density_at(p)))(positions)
        normals = -safe_normalize(grad)

        field_outputs = self.field.apply(
            {"params": params["fields"]}, ray_samples, train=train
        )
        rgb_raw = field_outputs[FieldHeadNames.RGB]

        # density blob + taper (reference :357-361). norm has a NaN gradient
        # at exactly 0 and the cameras look through the origin, so use a
        # smoothed norm.
        if cfg.initialize_density:
            strength = self._taper(step)
            r = jnp.sqrt(jnp.sum(positions**2, axis=-1) + 1e-8)
            blob = strength * (-jnp.exp(r / 0.4) + 2)[..., None]
            density = jnp.maximum(density + blob, 0.0)

        weights = ray_samples.get_weights(density)
        weights_list = weights_list + [weights]
        ray_samples_list = ray_samples_list + [ray_samples]

        accumulation = jnp.clip(
            jnp.nan_to_num(renderers.render_accumulation(weights)), 0.0, 1.0
        )
        depth = renderers.render_depth_expected(weights, ray_samples)
        rgb = renderers.render_rgb(rgb_raw, weights, background_color="black",
                                   train=train)
        rendered_normals = renderers.render_normals(normals, weights)

        # background MLP on ray directions (reference field :134-142)
        bg_rgb = self.bg_mlp.apply(
            {"params": params["field_background"]},
            self.bg_encoding(dirs).astype(jnp.float32),
        )
        accum_inv = 1.0 - accumulation
        background = accum_inv * bg_rgb

        # lambertian shading with a random light (reference :393-416)
        light_d = safe_normalize(
            c2w[:3, 3] + jax.random.normal(k_light, (3,))
            if cfg.random_light_source
            else c2w[:3, 3]
        )
        lambertian = jnp.clip(
            jnp.sum(rendered_normals * light_d, axis=-1, keepdims=True), 0.0, 1.0
        )
        start_lambert = step >= cfg.start_lambertian_training
        rand_shade = jax.random.uniform(k_shade, ()) > 0.75
        shading_weight = jnp.where(
            jnp.logical_and(start_lambert, rand_shade) if train else True,
            0.9, 0.0,
        )
        shade = (1.0 - shading_weight) + shading_weight * lambertian
        shaded = accumulation * rgb * shade
        shaded_albedo = accumulation * rgb * (
            (1.0 - shading_weight) + shading_weight * jax.lax.stop_gradient(shade)
        )

        # random background half the time in training (reference :418-420)
        rand_bg = jax.random.uniform(k_bg, (3,))
        use_rand_bg = jnp.logical_and(
            jax.random.uniform(k_choice, ()) < 0.5,
            jnp.asarray(cfg.random_background and train),
        )
        bg_used = jnp.where(use_rand_bg, accum_inv * rand_bg[None], background)

        train_output = jnp.where(
            shading_weight > 0,
            jnp.where(jax.random.uniform(k_choice, ()) > 0.5, shaded,
                      shaded_albedo + bg_used),
            accumulation * rgb + bg_used,
        )

        outputs = {
            "rgb": accumulation * rgb + background,
            "train_output": train_output,
            "accumulation": accumulation,
            "depth": depth,
            "expected_depth": depth,
            "normals": rendered_normals,
            "background_rgb": bg_rgb,
            "rendered_orientation_loss": orientation_loss(
                jax.lax.stop_gradient(weights), normals, dirs
            ),
        }
        if cfg.opacity_penalty:
            outputs["opacity_loss"] = (
                jnp.sqrt(jnp.sum(weights, axis=-2) ** 2 + 0.01)
                * cfg.opacity_loss_mult
            )
        if train:
            outputs["weights_list"] = weights_list
            outputs["ray_samples_list"] = ray_samples_list
        return outputs

    def generative_loss(self, params, outputs, batch, *, step, rng=None):
        """(reference get_loss_dict :440-493)."""
        cfg = self.config
        res = cfg.render_resolution
        loss_dict = {}
        train_normals = step >= cfg.start_normals_training
        loss_dict["orientation_loss"] = jnp.where(
            train_normals, self._orientation_mult(step), 0.0
        ) * jnp.mean(outputs["rendered_orientation_loss"])
        if cfg.opacity_penalty:
            loss_dict["opacity_loss"] = (
                cfg.opacity_loss_mult * jnp.mean(outputs["opacity_loss"])
            )
        guidance = self.get_guidance()
        image = outputs["train_output"].reshape(res, res, 3)
        loss_dict["sds_loss"] = guidance.sds_loss(
            self.prompt_embeddings, image,
            vertical=batch["vertical"], horizontal=batch["central"],
            guidance_scale=cfg.guidance_scale, rng=rng,
        )
        loss_dict["distortion_loss"] = cfg.distortion_loss_mult * distortion_loss(
            outputs["weights_list"], outputs["ray_samples_list"]
        )
        loss_dict["interlevel_loss"] = cfg.interlevel_loss_mult * interlevel_loss(
            outputs["weights_list"], outputs["ray_samples_list"]
        )
        return loss_dict

    # full-image eval path: render from an arbitrary stored camera
    def get_outputs_for_camera(
        self, params, cameras, camera_index: int, rng=None, width=None,
        height=None,
    ) -> Dict[str, np.ndarray]:
        c2w = jnp.asarray(cameras.camera_to_worlds[camera_index])
        focal = jnp.asarray(cameras.fx[camera_index])
        batch = {
            "c2w": c2w, "focal": focal,
            "vertical": jnp.asarray(0.0), "central": jnp.asarray(0.0),
        }
        out = self.generative_forward(
            params, batch, step=jnp.asarray(10**9), train=False,
            rng=rng if rng is not None else jax.random.PRNGKey(0),
        )
        res = self.config.render_resolution
        return {
            k: np.asarray(v).reshape(res, res, -1)
            for k, v in out.items()
            if k in ("rgb", "accumulation", "depth", "expected_depth", "normals")
        }

    def render_camera_device(
        self, params, cameras, camera_index: int,
        width=None, height=None, crop_aabb=None, include_per_sample=False,
    ):
        """Generative render is fixed-resolution [res, res, C]; returned
        as-is (the viewer handles image-shaped outputs directly).
        include_per_sample is accepted for interface parity and ignored."""
        return self.get_outputs_for_camera(
            params, cameras, camera_index, width=width, height=height
        )
