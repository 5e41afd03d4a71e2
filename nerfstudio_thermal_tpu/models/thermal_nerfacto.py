"""ThermalNerfacto: dual-spectrum (RGB + LWIR) nerfacto.

Behavioral spec: reference `nerfstudio/models/thermal_nerfacto.py:32-564` —
three density modes (:39): rgb_only (RGB field only), shared (one field with a
4-channel RGBT head; RGB and thermal share density), separate (second full
field + proposal stack + sampler for thermal); cross-spectral density L1 with
asymmetric detach (:327-344); pixel TV + cross-channel gradient losses; four
camera optimizers frozen on the opposite modality's cameras (:132-158); and
eval-only "removal" rendering that masks samples where RGB and thermal
densities disagree (:460-487).

Functional notes: the RGB and thermal branches consume the *same immutable*
input bundle — no deepcopy needed (reference :403-407). All reference boolean
ray filtering is replaced by static-shape masked means (see losses.py).
"""

from dataclasses import dataclass, field as dataclass_field
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp

from nerfstudio_thermal_tpu.cameras.camera_optimizers import (
    CameraOptimizerConfig,
    build_camera_optimizer,
)
from nerfstudio_thermal_tpu.cameras.rays import RayBundle
from nerfstudio_thermal_tpu.fields.base_field import FieldHeadNames
from nerfstudio_thermal_tpu.fields.density_fields import HashMLPDensityField
from nerfstudio_thermal_tpu.fields.nerfacto_field import ThermalNerfactoField
from nerfstudio_thermal_tpu.model_components import renderers
from nerfstudio_thermal_tpu.model_components.losses import (
    cross_channel_loss,
    distortion_loss,
    interlevel_loss,
    l1_loss,
    mse_loss,
    scale_gradients_by_distance_squared,
    tv_density_loss,
    tv_pixel_loss,
)
from nerfstudio_thermal_tpu.model_components.ray_samplers import proposal_sample
from nerfstudio_thermal_tpu.models.nerfacto import (
    NerfactoModel,
    NerfactoModelConfig,
    _dummy_ray_samples,
)
from nerfstudio_thermal_tpu.utils.math import psnr


@dataclass
class ThermalNerfactoModelConfig(NerfactoModelConfig):
    """(reference thermal_nerfacto.py:32-64)."""

    density_loss_mult: float = 5e-5
    density_mode: str = "separate"  # rgb_only | shared | separate
    rgb_density_loss_mult: float = 0.01
    density_loss_rays_fraction: float = 1.0
    """Fraction of the (randomly ordered) ray batch the cross-spectral
    density L1 is evaluated on during training. The cross evals run each
    field's full density MLP at the other field's samples — at 1.0 they cost
    as much as a third field pass (measured ~28% of the train step on v5e).
    The regularizer is a statistical constraint, so a uniform ray subsample
    estimates it unbiasedly; reference semantics (thermal_nerfacto.py:327-344)
    are exactly recovered at 1.0, which parity configs keep."""
    thermal_loss_mult: float = 100.0
    tv_rgb_loss_mult: float = 0.0
    tv_thermal_loss_mult: float = 0.0
    num_density_tv_samples: int = 5000
    tv_pixel_loss_mult: float = 1e-6
    cross_channel_loss_mult: float = 1e-6
    removal_min_density_diff: float = 0.05
    use_proposal_thermal_weight_anneal: bool = False
    fused_modalities: bool = False
    """TPU fast path for density_mode='separate' training: run the RGB and
    thermal pipelines (proposal hierarchy -> field -> render, plus the
    cross-density evals) as ONE vmapped program over a stacked modality axis
    instead of two sequential fusion chains, halving the XLA kernel count.
    The thermal head is padded to 3 channels so the two fields' params stack;
    channel 0 is the thermal output. Numerically equivalent to the unfused
    path (regression-tested); eval keeps the unfused path (removal rendering
    etc.). MEASURED SLOWER on v5e (67.2 vs 59.4 ms/step, 216 s vs 49 s
    compile: the stacked [2, N, ...] layouts vectorize worse than two
    sequential chains), so the flagship keeps it OFF; the knob remains for
    other TPU generations."""
    camera_optimizer_thermal: CameraOptimizerConfig = dataclass_field(
        default_factory=lambda: CameraOptimizerConfig(mode="SO3xR3", penalty_scale=10)
    )
    shared_camera_optimizer: CameraOptimizerConfig = dataclass_field(
        default_factory=lambda: CameraOptimizerConfig(mode="shared_SO3xR3", penalty_scale=-1)
    )
    shared_camera_optimizer_thermal: CameraOptimizerConfig = dataclass_field(
        default_factory=lambda: CameraOptimizerConfig(mode="shared_SO3xR3", penalty_scale=-1)
    )


class ThermalNerfactoModel(NerfactoModel):
    config: ThermalNerfactoModelConfig

    def populate_modules(self):
        super().populate_modules()
        cfg = self.config
        aabb = tuple(map(tuple, self.scene_aabb.tolist()))
        compute_dtype = self._compute_dtype

        self.output_suffixes = ("", "_thermal") if cfg.density_mode == "separate" else ("",)

        # Main field: 4-channel head when densities are shared
        # (reference :97-114).
        self.field = ThermalNerfactoField(
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
            num_channels=3 + (cfg.density_mode == "shared"),
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
        if cfg.density_mode == "separate":
            self.field_thermal = ThermalNerfactoField(
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
                # fused path: 3 channels so both fields' head params stack
                # (channel 0 is the thermal value; the extra 2 see no loss)
                num_channels=3 if cfg.fused_modalities else 1,
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
            self.proposal_networks_thermal: List[HashMLPDensityField] = []
            for i in range(cfg.num_proposal_iterations):
                args = cfg.proposal_net_args_list[
                    min(i, len(cfg.proposal_net_args_list) - 1)
                ]
                self.proposal_networks_thermal.append(self._build_proposal_net(args))

        # Camera optimizers: each modality frozen on the other's cameras
        # (reference :132-158).
        is_thermal = list(self.metadata.get("is_thermal", [0] * self.num_train_data))
        thermal_idx = tuple(i for i, x in enumerate(is_thermal) if x != 0)
        rgb_idx = tuple(i for i, x in enumerate(is_thermal) if x == 0)
        n = self.num_train_data
        self.camera_optimizer = build_camera_optimizer(
            cfg.camera_optimizer, n, non_trainable_camera_indices=thermal_idx
        )
        self.camera_optimizer_thermal = build_camera_optimizer(
            cfg.camera_optimizer_thermal, n,
            non_trainable_camera_indices=rgb_idx, suffix="_thermal",
        )
        self.shared_camera_optimizer = build_camera_optimizer(
            cfg.shared_camera_optimizer, n,
            non_trainable_camera_indices=thermal_idx, suffix="_shared",
        )
        self.shared_camera_optimizer_thermal = build_camera_optimizer(
            cfg.shared_camera_optimizer_thermal, n,
            non_trainable_camera_indices=rgb_idx, suffix="_shared_thermal",
        )

    # ------------------------------------------------------------------

    def init_params(self, rng: jax.Array) -> Dict[str, Any]:
        cfg = self.config
        keys = jax.random.split(rng, 8)
        params = super().init_params(keys[0])
        dummy = _dummy_ray_samples()
        if cfg.density_mode == "separate":
            params["fields_thermal"] = self.field_thermal.init(
                keys[1], dummy, train=True
            )["params"]
            prop_keys = jax.random.split(keys[2], len(self.proposal_networks_thermal))
            params["proposal_networks_thermal"] = {
                str(i): net.init(k, ray_samples=_dummy_ray_samples())["params"]
                for i, (net, k) in enumerate(zip(self.proposal_networks_thermal, prop_keys))
            }
            if self.camera_optimizer_thermal.mode != "off":
                params["camera_opt_thermal"] = self.camera_optimizer_thermal.init(
                    keys[3], jnp.zeros((1,), jnp.int32)
                )["params"]
            if self.shared_camera_optimizer_thermal.mode != "off":
                params["shared_camera_opt_thermal"] = (
                    self.shared_camera_optimizer_thermal.init(
                        keys[4], jnp.zeros((1,), jnp.int32)
                    )["params"]
                )
        if self.shared_camera_optimizer.mode != "off":
            params["shared_camera_opt"] = self.shared_camera_optimizer.init(
                keys[5], jnp.zeros((1,), jnp.int32)
            )["params"]
        return params

    def _density_fns_thermal(self, params):
        fns = []
        for i, net in enumerate(self.proposal_networks_thermal):
            p = params["proposal_networks_thermal"][str(i)]

            def fn(samples, net=net, p=p):
                if not self.config.proposal_camera_gradients:
                    samples = jax.lax.stop_gradient(samples)
                return net.apply({"params": p}, ray_samples=samples)

            fns.append(fn)
        return fns

    # ------------------------------------------------------------------

    def get_outputs(
        self,
        params,
        ray_bundle: RayBundle,
        *,
        train: bool = True,
        rng: Optional[jax.Array] = None,
        anneal=1.0,
        updated=True,
        anneal_thermal=1.0,
        updated_thermal=True,
    ):
        """(reference thermal_nerfacto.py:403-489)."""
        cfg = self.config
        if (
            cfg.density_mode == "separate"
            and cfg.fused_modalities
            and train
            and rng is not None
        ):
            return self._get_outputs_fused(
                params, ray_bundle, rng=rng, anneal=anneal, updated=updated,
                anneal_thermal=anneal_thermal, updated_thermal=updated_thermal,
            )
        rng_rgb, rng_t = (
            jax.random.split(rng) if rng is not None else (None, None)
        )

        bundle_rgb = self._apply_camera_opt(
            params, ray_bundle, "shared_camera_opt", self.shared_camera_optimizer
        )
        if train:
            bundle_rgb = self._apply_camera_opt(
                params, bundle_rgb, "camera_opt", self.camera_optimizer
            )

        ray_samples, weights_list, ray_samples_list = proposal_sample(
            bundle_rgb,
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
            rng=rng_rgb,
        )
        num_main_channels = 3 + (cfg.density_mode == "shared")
        outputs, weights_list, ray_samples_list = self._get_outputs_for_field(
            params, "fields", self.field, num_main_channels,
            ray_samples, weights_list, ray_samples_list, train=train,
            keep_sample_rgb=cfg.density_mode == "separate",
        )

        if cfg.density_mode == "shared":
            rgbt = outputs["rgb"]
            outputs["rgbt"] = rgbt
            outputs["rgb"] = rgbt[..., :3]
            outputs["rgb_thermal"] = rgbt[..., 3:]

        elif cfg.density_mode == "separate":
            bundle_t = self._apply_camera_opt(
                params, ray_bundle, "shared_camera_opt_thermal",
                self.shared_camera_optimizer_thermal,
            )
            if train:
                bundle_t = self._apply_camera_opt(
                    params, bundle_t, "camera_opt_thermal", self.camera_optimizer_thermal
                )
            ray_samples_t, weights_list_t, ray_samples_list_t = proposal_sample(
                bundle_t,
                self._density_fns_thermal(params),
                num_proposal_samples_per_ray=cfg.num_proposal_samples_per_ray,
                num_nerf_samples_per_ray=cfg.num_nerf_samples_per_ray,
                initial_spacing_kind=(
                    "uniform" if cfg.proposal_initial_sampler == "uniform" else "piecewise"
                ),
                single_jitter=cfg.use_single_jitter,
                anneal=anneal_thermal,
                updated=updated_thermal,
                train=train,
                rng=rng_t,
            )
            thermal_outputs, weights_list_t, ray_samples_list_t = (
                self._get_outputs_for_field(
                    params, "fields_thermal", self.field_thermal, 1,
                    ray_samples_t, weights_list_t, ray_samples_list_t, train=train,
                    keep_sample_rgb=True,
                )
            )
            for k, v in thermal_outputs.items():
                if k == "rgb":
                    v = v[..., :1]  # fused configs pad the head to 3 channels
                outputs[f"{k}_thermal"] = v

            if cfg.density_loss_mult > 0 or not train:
                # Cross-field density evals on each other's samples
                # (reference :447-458 runs the full forward; only DENSITY is
                # consumed, so evaluate the density path alone). In training
                # a ray-prefix subsample (rays are randomly ordered) bounds
                # the cost; eval always uses every ray (removal needs them).
                frac = cfg.density_loss_rays_fraction if train else 1.0
                num_rays = ray_samples.starts.shape[0]
                k = max(int(num_rays * frac) // 256 * 256, min(256, num_rays)) \
                    if frac < 1.0 else num_rays
                sub = lambda s: jax.tree.map(lambda x: x[:k], s)
                ray_samples_t_c = sub(ray_samples_t) if k < num_rays else ray_samples_t
                ray_samples_c = sub(ray_samples) if k < num_rays else ray_samples
                d2, _ = self.field.apply(
                    {"params": params["fields"]},
                    ray_samples_t_c,
                    method=self.field.get_density_from_rays,
                )
                if cfg.use_gradient_scaling:
                    d2 = scale_gradients_by_distance_squared(
                        {FieldHeadNames.DENSITY: d2}, ray_samples_t_c
                    )[FieldHeadNames.DENSITY]
                outputs["density2"] = d2

                d2t, _ = self.field_thermal.apply(
                    {"params": params["fields_thermal"]},
                    ray_samples_c,
                    method=self.field_thermal.get_density_from_rays,
                )
                if cfg.use_gradient_scaling:
                    d2t = scale_gradients_by_distance_squared(
                        {FieldHeadNames.DENSITY: d2t}, ray_samples_c
                    )[FieldHeadNames.DENSITY]
                outputs["density2_thermal"] = d2t

            if not train:
                # Removal rendering (reference :460-487): keep samples whose
                # relative cross-spectral density difference is small. The
                # per-sample colors are REUSED from the render passes above
                # ("rgb_samples" — see _get_outputs_for_field): re-applying
                # the fields here is bit-identical but runs the whole base
                # stack again (the Pallas custom-call defeats XLA CSE).
                diff = cfg.removal_min_density_diff
                rgb_samples = outputs.pop("rgb_samples")
                rgb_samples_t = outputs.pop("rgb_samples_thermal")
                # At exactly-zero density the reference's ratio is NaN/Inf
                # and the comparison falls out False; make that explicit so
                # no NaN ever enters the weight math (eval-output hygiene —
                # a zero-density sample contributes nothing either way).
                ratio_rgb = jnp.where(
                    outputs["density"] > 0,
                    outputs["density2_thermal"]
                    / jnp.maximum(outputs["density"], 1e-30),
                    jnp.inf,
                )
                mask_rgb = jnp.abs(1.0 - ratio_rgb) < diff
                w_rm = ray_samples.get_weights(outputs["density"] * mask_rgb)
                outputs["removal"] = renderers.render_rgb(
                    rgb_samples[..., :3], w_rm,
                    background_color=cfg.background_color, train=train,
                )

                ratio_t = jnp.where(
                    outputs["density_thermal"] > 0,
                    outputs["density2"]
                    / jnp.maximum(outputs["density_thermal"], 1e-30),
                    jnp.inf,
                )
                mask_t = jnp.abs(1.0 - ratio_t) < diff
                # Deliberate reference quirk (thermal_nerfacto.py:478-487):
                # removal_thermal composites the thermal densities with the
                # RGB hierarchy's ray_samples deltas, not ray_samples_t.
                w_rm_t = ray_samples.get_weights(outputs["density_thermal"] * mask_t)
                outputs["removal_thermal"] = renderers.render_rgb(
                    rgb_samples_t[..., :1], w_rm_t,
                    background_color=cfg.background_color, train=train,
                )

            if train:
                outputs["weights_list_thermal"] = weights_list_t
                outputs["ray_samples_list_thermal"] = ray_samples_list_t

        if train:
            outputs["weights_list"] = weights_list
            outputs["ray_samples_list"] = ray_samples_list
        return outputs

    # ------------------------------------------------------------------

    def _get_outputs_fused(
        self, params, ray_bundle: RayBundle, *, rng, anneal, updated,
        anneal_thermal, updated_thermal,
    ):
        """Both modality pipelines as ONE vmapped program over a stacked
        [2, ...] axis (RGB first, thermal second). Same semantics as the
        sequential path in get_outputs (reference thermal_nerfacto.py:403-458)
        with half the XLA kernels: every fusion processes both modalities."""
        cfg = self.config
        rng_rgb, rng_t = jax.random.split(rng)

        bundle_rgb = self._apply_camera_opt(
            params, ray_bundle, "shared_camera_opt", self.shared_camera_optimizer
        )
        bundle_rgb = self._apply_camera_opt(
            params, bundle_rgb, "camera_opt", self.camera_optimizer
        )
        bundle_t = self._apply_camera_opt(
            params, ray_bundle, "shared_camera_opt_thermal",
            self.shared_camera_optimizer_thermal,
        )
        bundle_t = self._apply_camera_opt(
            params, bundle_t, "camera_opt_thermal", self.camera_optimizer_thermal
        )

        stack = lambda a, b: jax.tree.map(lambda x, y: jnp.stack([x, y]), a, b)
        bundles = stack(bundle_rgb, bundle_t)
        field_params = stack(params["fields"], params["fields_thermal"])
        prop_params = stack(
            params["proposal_networks"], params["proposal_networks_thermal"]
        )
        rngs = jnp.stack([rng_rgb, rng_t])
        anneals = jnp.stack(
            [jnp.asarray(anneal, jnp.float32), jnp.asarray(anneal_thermal, jnp.float32)]
        )
        updateds = jnp.stack(
            [jnp.asarray(updated, bool), jnp.asarray(updated_thermal, bool)]
        )

        nets = self.proposal_networks
        field = self.field  # same architecture as field_thermal when fused

        def pipeline(fp, pp, bundle, key, anneal_i, updated_i):
            def make_fn(i):
                def fn(samples, p=pp[str(i)], net=nets[i]):
                    if not cfg.proposal_camera_gradients:
                        samples = jax.lax.stop_gradient(samples)
                    return net.apply({"params": p}, ray_samples=samples)
                return fn

            fns = [make_fn(i) for i in range(len(nets))]
            ray_samples, weights_list, ray_samples_list = proposal_sample(
                bundle, fns,
                num_proposal_samples_per_ray=cfg.num_proposal_samples_per_ray,
                num_nerf_samples_per_ray=cfg.num_nerf_samples_per_ray,
                initial_spacing_kind=(
                    "uniform" if cfg.proposal_initial_sampler == "uniform"
                    else "piecewise"
                ),
                single_jitter=cfg.use_single_jitter,
                anneal=anneal_i, updated=updated_i, train=True, rng=key,
            )
            field_outputs = field.apply({"params": fp}, ray_samples, train=True)
            if cfg.use_gradient_scaling:
                field_outputs = scale_gradients_by_distance_squared(
                    field_outputs, ray_samples
                )
            weights = ray_samples.get_weights(
                field_outputs[FieldHeadNames.DENSITY]
            )
            weights_list = weights_list + [weights]
            ray_samples_list = ray_samples_list + [ray_samples]
            out = {
                "rgb": renderers.render_rgb(
                    field_outputs[FieldHeadNames.RGB], weights,
                    background_color=cfg.background_color, train=True,
                ),
                "accumulation": renderers.render_accumulation(weights),
                "depth": jax.lax.stop_gradient(
                    renderers.render_depth_median(weights, ray_samples)
                ),
                "expected_depth": renderers.render_depth_expected(
                    weights, ray_samples
                ),
                "density": field_outputs[FieldHeadNames.DENSITY],
            }
            return out, weights_list, ray_samples_list, ray_samples

        s_out, s_wl, s_rsl, s_rs = jax.vmap(pipeline)(
            field_params, prop_params, bundles, rngs, anneals, updateds
        )

        take = lambda tree, i: jax.tree.map(lambda x: x[i], tree)
        outputs = {k: v[0] for k, v in s_out.items()}
        for k, v in s_out.items():
            outputs[f"{k}_thermal"] = v[1][..., :1] if k == "rgb" else v[1]
        outputs["weights_list"] = [w[0] for w in s_wl]
        outputs["weights_list_thermal"] = [w[1] for w in s_wl]
        outputs["ray_samples_list"] = [take(rs, 0) for rs in s_rsl]
        outputs["ray_samples_list_thermal"] = [take(rs, 1) for rs in s_rsl]

        if cfg.density_loss_mult > 0:
            # Cross-field density: each field at the OTHER field's samples —
            # one vmapped density chain over (params, flipped samples).
            frac = cfg.density_loss_rays_fraction
            num_rays = s_rs.starts.shape[1]
            k = max(int(num_rays * frac) // 256 * 256, min(256, num_rays)) \
                if frac < 1.0 else num_rays
            sub = (
                jax.tree.map(lambda x: x[:, :k], s_rs) if k < num_rays else s_rs
            )
            swapped = jax.tree.map(lambda x: jnp.flip(x, axis=0), sub)

            def cross_density(fp, samples):
                d, _ = field.apply(
                    {"params": fp}, samples.get_positions(),
                    method=field.get_density,
                )
                if cfg.use_gradient_scaling:
                    d = scale_gradients_by_distance_squared(
                        {FieldHeadNames.DENSITY: d}, samples
                    )[FieldHeadNames.DENSITY]
                return d

            d_cross = jax.vmap(cross_density)(field_params, swapped)
            outputs["density2"] = d_cross[0]          # RGB field @ thermal samples
            outputs["density2_thermal"] = d_cross[1]  # thermal field @ RGB samples
        return outputs

    # ------------------------------------------------------------------

    def get_metrics_dict(self, params, outputs, batch, train: bool = True):
        """(reference thermal_nerfacto.py:253-283)."""
        cfg = self.config
        is_thermal = batch["is_thermal"]
        gt = renderers.blend_background_rgbt(
            batch["image"], is_thermal, background_color=cfg.background_color
        )
        metrics = {
            "psnr_rgb": psnr(
                outputs["rgb"], gt[..., :3], mask=(1.0 - is_thermal)[..., None]
            )
        }
        if cfg.density_mode != "rgb_only":
            metrics["psnr_thermal"] = psnr(
                outputs["rgb_thermal"], gt[..., 3:], mask=is_thermal[..., None]
            )
        if train:
            d = 0.0
            for s in self.output_suffixes:
                d = d + distortion_loss(
                    outputs[f"weights_list{s}"], outputs[f"ray_samples_list{s}"]
                )
            metrics["distortion"] = d
            for name, opt in self._camera_optimizers(params):
                metrics.update(opt.metrics(params[name]))
        return metrics

    def _camera_optimizers(self, params):
        pairs = []
        for name, opt in (
            ("camera_opt", self.camera_optimizer),
            ("shared_camera_opt", self.shared_camera_optimizer),
            ("camera_opt_thermal", getattr(self, "camera_optimizer_thermal", None)),
            ("shared_camera_opt_thermal", getattr(self, "shared_camera_optimizer_thermal", None)),
        ):
            if opt is not None and opt.mode != "off" and name in params:
                if name.endswith("_thermal") and self.config.density_mode != "separate":
                    continue
                pairs.append((name, opt))
        return pairs

    def get_loss_dict(self, params, outputs, batch, metrics_dict, *, train=True, rng=None):
        """(reference thermal_nerfacto.py:284-388)."""
        cfg = self.config
        is_thermal = batch["is_thermal"]
        loss_dict = {}

        if cfg.density_mode != "rgb_only":
            pred4 = jnp.concatenate([outputs["rgb"], outputs["rgb_thermal"]], axis=-1)
        else:
            pred4 = jnp.concatenate(
                [outputs["rgb"], jnp.zeros_like(outputs["rgb"][..., :1])], axis=-1
            )
        pred_rgb, gt_rgb = renderers.blend_background_for_loss_rgbt(
            pred_image=pred4,
            pred_accumulation=outputs["accumulation"],
            gt_image=batch["image"],
            is_thermal=is_thermal,
            background_color=cfg.background_color,
            rng=rng,
        )

        # Density TV losses (reference :305-315); params-dependent sampling.
        if train and rng is not None:
            if cfg.tv_rgb_loss_mult > 0:
                dens = self.field.apply(
                    {"params": params["fields"]},
                    jax.random.fold_in(rng, 1),
                    cfg.num_density_tv_samples,
                    float(cfg.max_res),
                    method=self.field.sample_and_density,
                )
                loss_dict["tv_rgb_loss"] = cfg.tv_rgb_loss_mult * tv_density_loss(
                    dens, cfg.num_density_tv_samples
                )
            if cfg.density_mode == "separate" and cfg.tv_thermal_loss_mult > 0:
                dens = self.field_thermal.apply(
                    {"params": params["fields_thermal"]},
                    jax.random.fold_in(rng, 2),
                    cfg.num_density_tv_samples,
                    float(cfg.max_res),
                    method=self.field_thermal.sample_and_density,
                )
                loss_dict["tv_thermal_loss"] = (
                    cfg.tv_thermal_loss_mult
                    * tv_density_loss(dens, cfg.num_density_tv_samples)
                )

        # Pixel-wise reconstruction (reference :317-325): masked channels but
        # the mean runs over the full batch, exactly like the reference.
        rgb_mask = (1.0 - is_thermal)[:, None]
        loss_dict["rgb_loss"] = mse_loss(
            gt_rgb[..., :3] * rgb_mask, pred_rgb[..., :3] * rgb_mask
        )
        if cfg.density_mode != "rgb_only":
            t_mask = is_thermal[:, None]
            loss_dict["thermal_loss"] = cfg.thermal_loss_mult * mse_loss(
                gt_rgb[..., 3:] * t_mask, pred_rgb[..., 3:] * t_mask
            )

        # Cross-spectral density L1 with asymmetric detach (reference :327-344).
        if cfg.density_mode == "separate" and cfg.density_loss_mult > 0:
            d, d2 = outputs["density"], outputs["density2"]
            dt, d2t = outputs["density_thermal"], outputs["density2_thermal"]
            # cross evals may cover a ray-prefix subsample (see get_outputs)
            k = d2.shape[0]
            d, dt = d[:k], dt[:k]
            if cfg.rgb_density_loss_mult == 1:
                density_loss = l1_loss(d2, dt) + l1_loss(d, d2t)
                loss_dict["density_loss"] = cfg.density_loss_mult * density_loss
            else:
                sg = jax.lax.stop_gradient
                density_loss = l1_loss(sg(d2), dt) + l1_loss(sg(d), d2t)
                density_loss_rgb = l1_loss(d2, sg(dt)) + l1_loss(d, sg(d2t))
                loss_dict["density_loss"] = cfg.density_loss_mult * (
                    density_loss + cfg.rgb_density_loss_mult * density_loss_rgb
                )

        # Pixel TV + cross-channel gradient losses on RGB patches
        # (reference :346-356).
        if cfg.density_mode != "rgb_only" and cfg.tv_pixel_loss_mult > 0:
            loss_dict["tv_pixel_loss"] = cfg.tv_pixel_loss_mult * tv_pixel_loss(
                pred_rgb[..., 3:], is_thermal
            )
        if cfg.density_mode != "rgb_only" and cfg.cross_channel_loss_mult > 0:
            loss_dict["cross_channel_loss"] = (
                cfg.cross_channel_loss_mult
                * cross_channel_loss(pred_rgb[..., 3:], gt_rgb[..., :3], is_thermal)
            )

        if train:
            il = 0.0
            dl = 0.0
            for s in self.output_suffixes:
                il = il + cfg.interlevel_loss_mult * interlevel_loss(
                    outputs[f"weights_list{s}"], outputs[f"ray_samples_list{s}"]
                )
                dl = dl + cfg.distortion_loss_mult * metrics_dict["distortion"]
            loss_dict["interlevel_loss"] = il
            loss_dict["distortion_loss"] = dl
            for name, opt in self._camera_optimizers(params):
                # Reference adds per-camera regularizers only in training and
                # shared ones always; shared default is off anyway.
                loss_dict[f"camera_opt_regularizer{opt.suffix}"] = (
                    opt.regularization_loss(params[name])
                )
        return loss_dict
