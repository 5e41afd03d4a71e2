"""Nerfacto: proposal-sampled hash-grid NeRF.

Behavioral spec: reference `nerfstudio/models/nerfacto.py:53-447`
(config defaults :53-133, module graph :140-262, `_get_outputs:299-353`,
losses/metrics :367-409, proposal anneal callbacks :263-297).

TPU design: the whole forward — ray collider, 3-level proposal hierarchy
(256 -> 96 -> 48 samples), field eval, compositing — is one pure function and
traces into a single XLA program. The reference's stateful anneal/update-
schedule callbacks become traced scalars computed from `step`
(`proposal_anneal`, `proposal_updated` below), so no Python state exists
inside the hot loop.
"""

from dataclasses import dataclass, field as dataclass_field
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from nerfstudio_thermal_tpu.cameras.camera_optimizers import (
    CameraOptimizerConfig,
    build_camera_optimizer,
)
from nerfstudio_thermal_tpu.cameras.rays import RayBundle, RaySamples
from nerfstudio_thermal_tpu.fields.base_field import FieldHeadNames
from nerfstudio_thermal_tpu.fields.density_fields import HashMLPDensityField
from nerfstudio_thermal_tpu.fields.nerfacto_field import NerfactoField
from nerfstudio_thermal_tpu.model_components import renderers
from nerfstudio_thermal_tpu.model_components.losses import (
    distortion_loss,
    interlevel_loss,
    masked_mean,
    mse_loss,
    scale_gradients_by_distance_squared,
)
from nerfstudio_thermal_tpu.model_components.ray_samplers import proposal_sample
from nerfstudio_thermal_tpu.model_components.scene_colliders import NearFarCollider
from nerfstudio_thermal_tpu.models.base_model import Model, ModelConfig
from nerfstudio_thermal_tpu.utils.math import psnr


@dataclass
class NerfactoModelConfig(ModelConfig):
    """Nerfacto config; defaults mirror reference nerfacto.py:53-133."""

    near_plane: float = 0.05
    far_plane: float = 1000.0
    background_color: str = "last_sample"
    hidden_dim: int = 64
    hidden_dim_color: int = 64
    num_levels: int = 16
    base_res: int = 16
    max_res: int = 2048
    log2_hashmap_size: int = 19
    features_per_level: int = 2
    num_proposal_samples_per_ray: Tuple[int, ...] = (256, 96)
    num_nerf_samples_per_ray: int = 48
    proposal_update_every: int = 5
    proposal_warmup: int = 5000
    proposal_camera_gradients: bool = True
    """Let camera-optimizer pose gradients flow through the PROPOSAL density
    fields (reference behavior). The proposal levels evaluate the frequency
    encoding on the largest tensors of the step (rays x 128 samples), and
    their position-gradient chain runs in f32 — it exists only to add a
    second-order term to the camera-pose gradient (the base field's
    contribution dominates). False stops position gradients into proposal
    fields only: proposal params still train through the interlevel loss,
    camera opt still trains through the base field."""
    num_proposal_iterations: int = 2
    use_same_proposal_network: bool = False
    proposal_net_args_list: List[Dict] = dataclass_field(
        default_factory=lambda: [
            {"hidden_dim": 16, "log2_hashmap_size": 17, "num_levels": 5, "max_res": 128, "use_linear": False},
            {"hidden_dim": 16, "log2_hashmap_size": 17, "num_levels": 5, "max_res": 256, "use_linear": False},
        ]
    )
    proposal_initial_sampler: str = "piecewise"  # piecewise | uniform
    interlevel_loss_mult: float = 1.0
    distortion_loss_mult: float = 0.002
    orientation_loss_mult: float = 0.0001
    pred_normal_loss_mult: float = 0.001
    use_proposal_weight_anneal: bool = True
    use_appearance_embedding: bool = True
    use_average_appearance_embedding: bool = True
    proposal_weights_anneal_slope: float = 10.0
    proposal_weights_anneal_max_num_iters: int = 1000
    use_single_jitter: bool = True
    predict_normals: bool = False
    disable_scene_contraction: bool = False
    use_gradient_scaling: bool = False
    appearance_embed_dim: int = 32
    average_init_density: float = 1.0
    camera_optimizer: CameraOptimizerConfig = dataclass_field(
        default_factory=lambda: CameraOptimizerConfig(mode="SO3xR3")
    )
    compute_dtype: str = "float32"  # "bfloat16" on TPU for the MLP/hash path
    use_pallas: bool = False
    fused_raymarch: bool = False
    """Fold position generation + scene contraction + selector into the Pallas
    BASE-field kernel (ops/pallas/fused_mlp.fused_ray_mlp): the field consumes
    (origins, dirs, midpoints) and per-sample position tensors never exist in
    HBM. Requires use_pallas + freq fields + scene contraction."""
    fused_field: bool = False
    """Run the WHOLE base field (ray-march + base MLP + SH + appearance +
    color head) as one Pallas kernel. Implies/extends fused_raymarch."""
    fused_raymarch_proposals: bool = False
    """Same fusion for the PROPOSAL density fields. Separate knob: the
    64-wide proposal MLP runs ~2.5x slower under Pallas than XLA (narrow
    matmuls waste the MXU), so folding the position machinery in must win
    back more than that."""
    field_encoding: str = "hash"  # "hash" (reference parity) | "freq" (MXU-dense)
    freq_num_frequencies: int = 10
    freq_num_layers: int = 8
    freq_hidden_dim: int = 256
    freq_use_skip: bool = True
    freq_final_init_scale: float = 1.0


def proposal_anneal(step, max_iters: int, slope: float):
    """Proposal weight anneal, https://arxiv.org/pdf/2111.12077 eq. 18
    (reference nerfacto.py:271-283). Pure in `step` (traced-safe)."""
    train_frac = jnp.clip(step / max_iters, 0.0, 1.0)
    return slope * train_frac / ((slope - 1.0) * train_frac + 1.0)


def proposal_update_schedule(step, warmup: int, update_every: int):
    """Steps between proposal-grad updates (reference nerfacto.py:207-212)."""
    return jnp.clip(step * (update_every / warmup), 1, update_every)


def proposal_updated(step, steps_since_update, warmup: int, update_every: int):
    """Whether this step propagates gradients to proposal nets
    (reference ray_samplers.py:592). Returns (updated, new_counter)."""
    sched = proposal_update_schedule(step, warmup, update_every)
    updated = (steps_since_update > sched) | (step < 10)
    new_counter = jnp.where(updated, 0, steps_since_update) + 1
    return updated, new_counter


class NerfactoModel(Model):
    """Functional nerfacto."""

    config: NerfactoModelConfig

    def populate_modules(self):
        cfg = self.config
        compute_dtype = jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else jnp.float32
        self._compute_dtype = compute_dtype
        aabb = tuple(map(tuple, self.scene_aabb.tolist()))

        self.field = NerfactoField(
            aabb=aabb,
            num_images=self.num_train_data,
            hidden_dim=cfg.hidden_dim,
            num_levels=cfg.num_levels,
            max_res=cfg.max_res,
            base_res=cfg.base_res,
            features_per_level=cfg.features_per_level,
            log2_hashmap_size=cfg.log2_hashmap_size,
            hidden_dim_color=cfg.hidden_dim_color,
            use_spatial_distortion=not cfg.disable_scene_contraction,
            use_average_appearance_embedding=cfg.use_average_appearance_embedding,
            appearance_embedding_dim=(
                cfg.appearance_embed_dim if cfg.use_appearance_embedding else 0
            ),
            average_init_density=cfg.average_init_density,
            num_channels=3,
            compute_dtype=compute_dtype,
            use_pallas=cfg.use_pallas,
            fused_raymarch=cfg.fused_raymarch,
            fused_field=cfg.fused_field,
            field_encoding=cfg.field_encoding,
            freq_num_frequencies=cfg.freq_num_frequencies,
            freq_num_layers=cfg.freq_num_layers,
            freq_hidden_dim=cfg.freq_hidden_dim,
            freq_use_skip=cfg.freq_use_skip,
            freq_final_init_scale=cfg.freq_final_init_scale,
        )

        num_prop_nets = cfg.num_proposal_iterations
        self.proposal_networks: List[HashMLPDensityField] = []
        if cfg.use_same_proposal_network:
            assert len(cfg.proposal_net_args_list) == 1
            net = self._build_proposal_net(cfg.proposal_net_args_list[0])
            self.proposal_networks = [net] * num_prop_nets
            self._unique_proposal_networks = [net]
        else:
            for i in range(num_prop_nets):
                args = cfg.proposal_net_args_list[min(i, len(cfg.proposal_net_args_list) - 1)]
                self.proposal_networks.append(self._build_proposal_net(args))
            self._unique_proposal_networks = self.proposal_networks

        self.camera_optimizer = build_camera_optimizer(
            cfg.camera_optimizer, num_cameras=self.num_train_data
        )
        self.collider = NearFarCollider(cfg.near_plane, cfg.far_plane)

    def _build_proposal_net(self, args: Dict):
        """Proposal density field from a proposal_net_args_list entry; an
        `{"encoding": "freq"}` entry selects the MXU-dense MLPDensityField."""
        from nerfstudio_thermal_tpu.fields.density_fields import MLPDensityField

        cfg = self.config
        args = dict(args)
        encoding = args.pop("encoding", "hash")
        if encoding == "freq":
            args.pop("log2_hashmap_size", None)
            args.pop("num_levels", None)
            args.pop("max_res", None)
            args.pop("use_linear", None)
            args.pop("features_per_level", None)
            return MLPDensityField(
                aabb=tuple(map(tuple, self.scene_aabb.tolist())),
                use_spatial_distortion=not cfg.disable_scene_contraction,
                average_init_density=cfg.average_init_density,
                compute_dtype=self._compute_dtype,
                use_pallas=cfg.use_pallas,
                fused_raymarch=cfg.fused_raymarch_proposals,
                fused_raymarch_input_grads=cfg.proposal_camera_gradients,
                **args,
            )
        return HashMLPDensityField(
            aabb=tuple(map(tuple, self.scene_aabb.tolist())),
            use_spatial_distortion=not cfg.disable_scene_contraction,
            average_init_density=cfg.average_init_density,
            compute_dtype=self._compute_dtype,
            use_pallas=cfg.use_pallas,
            **args,
        )

    # ------------------------------------------------------------------

    def init_params(self, rng: jax.Array) -> Dict[str, Any]:
        """Grouped params matching the reference optimizer groups
        (reference nerfacto.py:255-262)."""
        k_field, k_prop, k_cam = jax.random.split(rng, 3)
        dummy_samples = _dummy_ray_samples()
        params: Dict[str, Any] = {}
        params["fields"] = self.field.init(k_field, dummy_samples, train=True)["params"]
        prop_keys = jax.random.split(k_prop, len(self._unique_proposal_networks))
        params["proposal_networks"] = {
            str(i): net.init(k, ray_samples=dummy_samples)["params"]
            for i, (net, k) in enumerate(zip(self._unique_proposal_networks, prop_keys))
        }
        if self.camera_optimizer.mode != "off":
            params["camera_opt"] = self.camera_optimizer.init(
                k_cam, jnp.zeros((1,), jnp.int32)
            )["params"]
        return params

    def _density_fns(self, params):
        fns = []
        unique = self._unique_proposal_networks
        for i in range(self.config.num_proposal_iterations):
            j = min(i, len(unique) - 1) if self.config.use_same_proposal_network else i
            net = unique[j]
            p = params["proposal_networks"][str(j)]

            def fn(samples, net=net, p=p):
                if not self.config.proposal_camera_gradients:
                    samples = jax.lax.stop_gradient(samples)
                return net.apply({"params": p}, ray_samples=samples)

            fns.append(fn)
        return fns

    def density_fn(self, params, positions: jax.Array) -> jax.Array:
        """Field density at world positions [..., 3] -> [..., 1] (used by the
        marching-cubes/texture exporters; reference exposes this through
        `Field.density_fn`)."""
        return self.field.apply(
            {"params": params["fields"]}, positions, method=self.field.density_fn
        )

    def _apply_camera_opt(self, params, bundle: RayBundle, name: str, opt) -> RayBundle:
        if opt.mode == "off" or name not in params:
            return bundle
        return opt.apply({"params": params[name]}, bundle, method=opt.apply_to_raybundle)

    # ------------------------------------------------------------------

    def _get_outputs_for_field(
        self,
        params,
        field_name: str,
        field: NerfactoField,
        renderer_channels: int,
        ray_samples: RaySamples,
        weights_list,
        ray_samples_list,
        *,
        train: bool,
        keep_sample_rgb: bool = False,
    ):
        """Shared per-field render (reference nerfacto.py:299-353).

        keep_sample_rgb: eval-only — also return the per-sample color as
        "rgb_samples" so callers that need the raw field output again
        (thermal removal rendering) can REUSE it instead of re-applying the
        field: the Pallas base-MLP custom-call blocks XLA's CSE, so a second
        apply really runs the whole field twice (measured: 6 base-MLP calls
        per eval chunk where 4 suffice, ~49% of a 1080p frame)."""
        cfg = self.config
        field_outputs = field.apply(
            {"params": params[field_name]}, ray_samples, train=train
        )
        if cfg.use_gradient_scaling:
            field_outputs = scale_gradients_by_distance_squared(field_outputs, ray_samples)

        weights = ray_samples.get_weights(field_outputs[FieldHeadNames.DENSITY])
        weights_list = weights_list + [weights]
        ray_samples_list = ray_samples_list + [ray_samples]

        rgb = renderers.render_rgb(
            field_outputs[FieldHeadNames.RGB],
            weights,
            background_color=cfg.background_color,
            train=train,
        )
        depth = jax.lax.stop_gradient(
            renderers.render_depth_median(weights, ray_samples)
        )
        expected_depth = renderers.render_depth_expected(weights, ray_samples)
        accumulation = renderers.render_accumulation(weights)

        outputs = {
            "rgb": rgb,
            "accumulation": accumulation,
            "depth": depth,
            "expected_depth": expected_depth,
            "density": field_outputs[FieldHeadNames.DENSITY],
        }
        if keep_sample_rgb and not train:
            outputs["rgb_samples"] = field_outputs[FieldHeadNames.RGB]
        if not train:
            # proposal depth maps are logging/eval-only (reference keeps them
            # always; skipping in train saves several masked reductions/step)
            for i in range(cfg.num_proposal_iterations):
                outputs[f"prop_depth_{i}"] = renderers.render_depth_median(
                    weights_list[i], ray_samples_list[i]
                )
        return outputs, weights_list, ray_samples_list

    def get_outputs(
        self,
        params,
        ray_bundle: RayBundle,
        *,
        train: bool = True,
        rng: Optional[jax.Array] = None,
        anneal=1.0,
        updated=True,
    ):
        cfg = self.config
        if train:
            ray_bundle = self._apply_camera_opt(
                params, ray_bundle, "camera_opt", self.camera_optimizer
            )
        ray_samples, weights_list, ray_samples_list = proposal_sample(
            ray_bundle,
            self._density_fns(params),
            num_proposal_samples_per_ray=cfg.num_proposal_samples_per_ray,
            num_nerf_samples_per_ray=cfg.num_nerf_samples_per_ray,
            initial_spacing_kind=(
                "uniform" if cfg.proposal_initial_sampler == "uniform" else "piecewise"
            ),
            single_jitter=cfg.use_single_jitter,
            anneal=anneal,
            updated=updated,
            train=train,
            rng=rng,
        )
        outputs, weights_list, ray_samples_list = self._get_outputs_for_field(
            params, "fields", self.field, 3, ray_samples, weights_list,
            ray_samples_list, train=train,
        )
        if train:
            outputs["weights_list"] = weights_list
            outputs["ray_samples_list"] = ray_samples_list
        return outputs

    # ------------------------------------------------------------------
    # Metrics / losses (pure; run inside the jitted train step)
    # ------------------------------------------------------------------

    def get_metrics_dict(self, params, outputs, batch, train: bool = True):
        """(reference nerfacto.py:367-378)."""
        gt_rgb = renderers.blend_background_rgb(batch["image"])
        metrics = {"psnr": psnr(outputs["rgb"], gt_rgb)}
        if train:
            metrics["distortion"] = distortion_loss(
                outputs["weights_list"], outputs["ray_samples_list"]
            )
            if "camera_opt" in params:
                metrics.update(self.camera_optimizer.metrics(params["camera_opt"]))
        return metrics

    def get_loss_dict(self, params, outputs, batch, metrics_dict, *, train=True, rng=None):
        """(reference nerfacto.py:380-409)."""
        cfg = self.config
        pred_rgb, gt_rgb = renderers.blend_background_for_loss_rgb(
            pred_image=outputs["rgb"],
            pred_accumulation=outputs["accumulation"],
            gt_image=batch["image"],
            background_color=cfg.background_color,
            rng=rng,
        )
        loss_dict = {"rgb_loss": mse_loss(gt_rgb, pred_rgb)}
        if train:
            loss_dict["interlevel_loss"] = cfg.interlevel_loss_mult * interlevel_loss(
                outputs["weights_list"], outputs["ray_samples_list"]
            )
            loss_dict["distortion_loss"] = (
                cfg.distortion_loss_mult * metrics_dict["distortion"]
            )
            if "camera_opt" in params:
                loss_dict["camera_opt_regularizer"] = (
                    self.camera_optimizer.regularization_loss(params["camera_opt"])
                )
        return loss_dict


def _dummy_ray_samples(num_rays: int = 2, num_samples: int = 4) -> RaySamples:
    """Tiny RaySamples for flax init tracing."""
    return RaySamples(
        origins=jnp.zeros((num_rays, 3)),
        directions=jnp.ones((num_rays, 3)) / jnp.sqrt(3.0),
        pixel_area=jnp.ones((num_rays, 1)),
        camera_indices=jnp.zeros((num_rays, 1), jnp.int32),
        starts=jnp.ones((num_rays, num_samples, 1)),
        ends=jnp.ones((num_rays, num_samples, 1)) * 1.1,
        spacing_starts=jnp.zeros((num_rays, num_samples, 1)),
        spacing_ends=jnp.ones((num_rays, num_samples, 1)),
        s_near=jnp.zeros((num_rays, 1)),
        s_far=jnp.ones((num_rays, 1)),
    )
