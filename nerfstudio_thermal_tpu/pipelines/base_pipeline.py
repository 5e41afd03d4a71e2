"""Pipeline: glue of datamanager + model.

Behavioral spec: reference `nerfstudio/pipelines/base_pipeline.py:223-439`
(`get_train_loss_dict:291`, eval-image metric aggregation tolerant of
missing keys :391-404 — RGB metrics only exist on RGB eval images). The DDP
wrap/barrier (:280-283) disappears: parallelism is sharding in the trainer.
"""

from dataclasses import dataclass
from typing import Any, Dict, Optional, Tuple

import numpy as np

from nerfstudio_thermal_tpu.data.datamanagers import VanillaDataManager
from nerfstudio_thermal_tpu.models.base_model import Model
from nerfstudio_thermal_tpu.utils.math import psnr as psnr_fn, ssim as ssim_fn


class VanillaPipeline:
    def __init__(self, datamanager: VanillaDataManager, model: Model):
        self.datamanager = datamanager
        self.model = model

    # The jitted train path lives in engine/trainer.py (the jit boundary is
    # the whole step); this class provides the eval-image machinery.

    def get_eval_image_metrics_and_images(
        self, params, step: int, rng=None
    ) -> Tuple[Dict[str, float], Dict[str, np.ndarray]]:
        """Render the next eval image and compute per-modality metrics
        (reference base_pipeline.py:314-345 + thermal_nerfacto.py:491-564)."""
        idx, batch = self.datamanager.next_eval_image(step)
        outputs = self.model.get_outputs_for_camera(
            params, self.datamanager.eval_cameras, idx, rng=rng
        )
        return self.compute_image_metrics(outputs, batch, idx)

    def compute_image_metrics(self, outputs, batch, idx: int):
        import jax.numpy as jnp

        gt = np.asarray(batch["image"])[..., :3]
        is_thermal = float(np.asarray(batch.get("is_thermal", 0.0)))
        metrics: Dict[str, float] = {}
        images: Dict[str, np.ndarray] = {}

        from nerfstudio_thermal_tpu.utils.lpips import (
            lpips,
            lpips_available,
            lpips_metric_name,
        )

        pred_rgb = outputs["rgb"]
        pred_t = outputs.get("rgb_thermal")
        if is_thermal < 1:
            metrics["psnr_rgb"] = float(psnr_fn(jnp.asarray(pred_rgb), jnp.asarray(gt)))
            metrics["ssim_rgb"] = float(ssim_fn(jnp.asarray(pred_rgb), jnp.asarray(gt)))
            if lpips_available():
                metrics[lpips_metric_name("rgb")] = lpips(
                    jnp.asarray(pred_rgb), jnp.asarray(gt)
                )
            gt_img = gt
        elif pred_t is not None:
            gt_t = gt[..., :1]
            metrics["psnr_thermal"] = float(
                psnr_fn(jnp.asarray(pred_t), jnp.asarray(gt_t))
            )
            metrics["ssim_thermal"] = float(
                ssim_fn(jnp.asarray(pred_t), jnp.asarray(gt_t))
            )
            if lpips_available():
                # LPIPS needs 3 channels; replicate (reference :548-549)
                metrics[lpips_metric_name("thermal")] = lpips(
                    jnp.repeat(jnp.asarray(pred_t), 3, -1),
                    jnp.repeat(jnp.asarray(gt_t), 3, -1),
                )
            gt_img = np.repeat(gt_t, 3, -1)
        else:
            gt_img = gt

        # Eval image grid: GT | pred RGB | pred thermal (three-panel when a
        # thermal head exists, reference thermal_nerfacto.py:504-522)
        panels = [gt_img, pred_rgb]
        if pred_t is not None and pred_t.shape[:2] == pred_rgb.shape[:2]:
            panels.append(np.repeat(np.asarray(pred_t), 3, -1))
        images["img"] = np.concatenate(panels, axis=1)

        from nerfstudio_thermal_tpu.utils.colormaps import apply_depth_colormap

        depth_panels = [
            apply_depth_colormap(
                np.asarray(outputs["depth"]),
                accumulation=np.asarray(outputs["accumulation"]),
            )
        ]
        if "depth_thermal" in outputs and (
            outputs["depth_thermal"].shape[:2] == outputs["depth"].shape[:2]
        ):
            depth_panels.append(
                apply_depth_colormap(
                    np.asarray(outputs["depth_thermal"]),
                    accumulation=np.asarray(outputs["accumulation_thermal"]),
                )
            )
        images["depth"] = np.concatenate(depth_panels, axis=1)
        images["accumulation"] = outputs["accumulation"]
        # actual rendered ray count, for throughput bookkeeping (robust to
        # eval ordering, unlike inferring the camera as i % n)
        metrics["_num_rays"] = float(
            np.asarray(outputs["rgb"]).shape[0] * np.asarray(outputs["rgb"]).shape[1]
        )
        # proposal hierarchy depth maps (reference thermal_nerfacto.py:556-562)
        for k in sorted(outputs):
            if k.startswith("prop_depth_"):
                images[k] = apply_depth_colormap(
                    np.asarray(outputs[k]),
                    accumulation=np.asarray(outputs["accumulation"]),
                )
        return metrics, images

    def get_average_eval_image_metrics(
        self, params, step: int = 0, rng=None
    ) -> Dict[str, float]:
        """Mean/std over the eval set, key-tolerant, plus render throughput
        (num_rays_per_sec / fps, reference base_pipeline.py:347-406 and
        :381-386)."""
        import time

        n = len(self.datamanager.eval_dataset)
        # Warm the jitted render path once per pipeline so the first image's
        # throughput number excludes the one-off compile (repeat calls skip
        # it — the chunked render's jit cache is already hot).
        if not getattr(self, "_eval_render_warmed", False):
            try:
                self.model.get_outputs_for_camera(
                    params, self.datamanager.eval_cameras, 0, rng=rng
                )
                self._eval_render_warmed = True  # only a SUCCESSFUL render warms
            except Exception:
                pass
        all_metrics = []
        for i in range(n):
            t0 = time.perf_counter()
            m, _ = self.get_eval_image_metrics_and_images(params, step, rng=rng)
            dt = max(time.perf_counter() - t0, 1e-9)
            num_rays = m.pop("_num_rays", 0.0)
            m["num_rays_per_sec"] = num_rays / dt
            m["fps"] = 1.0 / dt
            all_metrics.append(m)
        keys = {k for m in all_metrics for k in m}
        out = {}
        for k in keys:
            vals = [m[k] for m in all_metrics if k in m]
            out[k] = float(np.mean(vals))
            out[f"{k}_std"] = float(np.std(vals))
        return out
