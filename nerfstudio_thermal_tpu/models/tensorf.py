"""TensoRF model.

Behavioral spec: reference `nerfstudio/models/tensorf.py:47-378` — VM-
decomposed field, uniform + PDF sampling, RGB MSE + L1 regularization on the
tensor factors. The reference's grid-upsampling schedule (tensorf.py:49-130)
is reproduced host-side via the trainer's refinement hook: at each scheduled
step the VM grids are bilinearly resized on the host and the jitted train
step re-traces at the new shapes.
"""

from dataclasses import dataclass
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp

from nerfstudio_thermal_tpu.cameras.rays import RayBundle
from nerfstudio_thermal_tpu.fields.base_field import FieldHeadNames
from nerfstudio_thermal_tpu.fields.tensorf_field import TensoRFField
from nerfstudio_thermal_tpu.model_components import renderers
from nerfstudio_thermal_tpu.model_components.losses import mse_loss
from nerfstudio_thermal_tpu.model_components.ray_samplers import (
    pdf_sample,
    spaced_sample,
)
from nerfstudio_thermal_tpu.model_components.scene_colliders import AABBBoxCollider
from nerfstudio_thermal_tpu.models.base_model import Model, ModelConfig
from nerfstudio_thermal_tpu.utils.math import psnr


@dataclass
class TensoRFModelConfig(ModelConfig):
    num_uniform_samples: int = 200
    num_samples: int = 50
    resolution: int = 128
    """Initial VM grid resolution (reference init_resolution)."""
    final_resolution: int = 300
    upsampling_iters: Tuple[int, ...] = (2000, 3000, 4000, 5500, 7000)
    """Steps at which the VM grids are bilinearly upsampled toward
    final_resolution on a log schedule (reference tensorf.py:49-130). The
    resize happens HOST-side via the trainer's refinement hook (the jitted
    step re-traces on the new shapes) — the functional replacement for the
    reference's shape-mutating callback."""
    density_components: int = 16
    color_components: int = 48
    appearance_dim: int = 27
    l1_reg_mult: float = 5e-4
    background_color: str = "white"
    near_plane: float = 2.0
    far_plane: float = 6.0
    compute_dtype: str = "float32"
    use_pallas: bool = False


class TensoRFModel(Model):
    config: TensoRFModelConfig

    def populate_modules(self):
        cfg = self.config
        dtype = jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else jnp.float32
        self.field = TensoRFField(
            aabb=tuple(map(tuple, self.scene_aabb.tolist())),
            resolution=cfg.resolution,
            density_components=cfg.density_components,
            color_components=cfg.color_components,
            appearance_dim=cfg.appearance_dim,
            compute_dtype=dtype,
        )
        self.collider = AABBBoxCollider(
            jnp.asarray(self.scene_aabb), near_plane=cfg.near_plane
        )

    def init_params(self, rng: jax.Array) -> Dict[str, Any]:
        from nerfstudio_thermal_tpu.models.nerfacto import _dummy_ray_samples

        return {
            "fields": self.field.init(rng, _dummy_ray_samples(), train=True)["params"]
        }

    # --- mid-training VM grid upsampling (host-side) -------------------

    def _resolution_schedule(self):
        import numpy as np

        cfg = self.config
        n = len(cfg.upsampling_iters)
        res = np.rint(
            np.exp(
                np.linspace(
                    np.log(cfg.resolution), np.log(cfg.final_resolution), n + 1
                )
            )
        ).astype(np.int64)[1:]
        return {int(s): int(r) for s, r in zip(cfg.upsampling_iters, res)}

    def wants_host_refinement(self, step: int) -> bool:
        return step in self._resolution_schedule()

    def refine_host(self, params, opt_state, extra, step: int):
        """Bilinearly upsample the plane/line grids (and zero the matching
        Adam moments, like the reference's optimizer reinit,
        tensorf.py:126-149)."""
        import numpy as np
        import jax
        import jax.numpy as jnp

        new_r = self._resolution_schedule()[step]

        def lin1d(x, axis, r_old):
            """linear resample along `axis` from r_old to new_r (numpy;
            cv2.resize caps at 4 channels, the VM grids have 16/48)."""
            xi = np.linspace(0, r_old - 1, new_r)
            i0 = np.floor(xi).astype(int)
            i1 = np.minimum(i0 + 1, r_old - 1)
            f = xi - i0
            a = np.take(x, i0, axis=axis)
            b = np.take(x, i1, axis=axis)
            shape = [1] * x.ndim
            shape[axis] = new_r
            f = f.reshape(shape)
            return a * (1 - f) + b * f

        def resize(x):
            x = np.asarray(x)
            if x.ndim == 4 and x.shape[1] == x.shape[2]:  # [3, r, r, C]
                r = x.shape[1]
                return lin1d(lin1d(x, 1, r), 2, r).astype(np.float32)
            if x.ndim == 3:  # [3, r, C] lines
                return lin1d(x, 1, x.shape[1]).astype(np.float32)
            return x

        grid_keys = ("density_planes", "density_lines",
                     "color_planes", "color_lines")
        f = dict(params["fields"])
        for k in grid_keys:
            f[k] = jnp.asarray(resize(f[k]))
        new_params = {**params, "fields": f}

        # zero optimizer moments whose leaves changed shape
        def fix(x):
            if hasattr(x, "shape") and x.ndim in (3, 4):
                for k in grid_keys:
                    old = np.asarray(params["fields"][k])
                    if x.shape == old.shape and x.shape != np.asarray(f[k]).shape:
                        return jnp.zeros_like(jnp.asarray(resize(x)))
            return x

        new_opt = jax.tree.map(fix, opt_state)
        # rebuild the field module at the new declared resolution (flax
        # validates param shapes against the module's init spec on apply)
        self.field = self.field.clone(resolution=new_r)
        print(f"tensorf: upsampled VM grids to {new_r}^2 at step {step}")
        return new_params, new_opt, extra

    def get_outputs(self, params, ray_bundle: RayBundle, *, train=True, rng=None, **_):
        cfg = self.config
        rng_u, rng_pdf = jax.random.split(rng) if rng is not None else (None, None)
        fparams = {"params": params["fields"]}

        coarse = spaced_sample(
            ray_bundle, cfg.num_uniform_samples, spacing_kind="uniform",
            train=train, rng=rng_u,
        )
        dens_c = self.field.apply(
            fparams, coarse.get_positions(), method=self.field.density_fn
        )
        w_c = coarse.get_weights(dens_c)

        fine = pdf_sample(
            ray_bundle, coarse, w_c, cfg.num_samples,
            include_original=True, train=train, rng=rng_pdf,
        )
        out = self.field.apply(fparams, fine, train=train)
        w = fine.get_weights(out[FieldHeadNames.DENSITY])
        rgb = renderers.render_rgb(
            out[FieldHeadNames.RGB], w, cfg.background_color, train=train
        )
        return {
            "rgb": rgb,
            "accumulation": renderers.render_accumulation(w),
            "depth": renderers.render_depth_median(w, fine),
            "expected_depth": renderers.render_depth_expected(w, fine),
        }

    def get_metrics_dict(self, params, outputs, batch, train=True):
        gt = renderers.blend_background_rgb(batch["image"])
        return {"psnr": psnr(outputs["rgb"], gt)}

    def get_loss_dict(self, params, outputs, batch, metrics_dict, *, train=True, rng=None):
        gt = renderers.blend_background_rgb(batch["image"])
        loss_dict = {"rgb_loss": mse_loss(outputs["rgb"], gt)}
        if train and self.config.l1_reg_mult > 0:
            f = params["fields"]
            l1 = (
                jnp.mean(jnp.abs(f["density_planes"]))
                + jnp.mean(jnp.abs(f["density_lines"]))
            )
            loss_dict["l1_reg"] = self.config.l1_reg_mult * l1
        return loss_dict
