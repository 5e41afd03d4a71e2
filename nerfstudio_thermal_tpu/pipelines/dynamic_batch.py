"""Dynamic ray-batch sizing for occupancy-grid models (instant-ngp).

Behavioral spec: reference `nerfstudio/pipelines/dynamic_batch.py:36-105` —
scale the number of rays per batch so the total number of *volumetric
samples* per step stays near `target_num_samples` (empty space skipped by the
occupancy grid means cheap rays; the batch grows to keep the device busy).

TPU-native redesign: the reference changes the batch size every step, which
would re-trace the jitted SPMD train step on every new shape. Here the batch
size is quantized to power-of-two buckets between `min_/max_num_rays`, so at
most log2(max/min)+1 distinct shapes ever compile (each is cached by jit),
and the adjustment runs only every `update_every` steps — which is also the
only time the live-sample scalar is fetched to the host (device->host sync
through the TPU tunnel costs ~25 ms; doing it every step would dominate).

The live-sample measurement comes from the model: InstantNGPModel reports
`num_samples_per_ray` (mean count of occupancy-unmasked samples) in its train
metrics, the analogue of nerfacc's packed-sample count the reference divides
by (dynamic_batch.py:60-73).
"""

from dataclasses import dataclass
from math import log2

import numpy as np

from nerfstudio_thermal_tpu.pipelines.base_pipeline import VanillaPipeline


@dataclass
class DynamicBatchPipelineConfig:
    target_num_samples: int = 1 << 18
    """Target volumetric samples per train step (reference dynamic_batch.py:38)."""
    max_num_rays_per_batch: int = 1 << 14
    min_num_rays_per_batch: int = 1 << 10
    update_every: int = 16
    """Steps between batch-size adjustments (each adjustment fetches one
    scalar from the device and may hit a new jit bucket)."""


class DynamicBatchPipeline(VanillaPipeline):
    def __init__(self, datamanager, model, config=None):
        super().__init__(datamanager, model)
        self.dynamic_config = config or DynamicBatchPipelineConfig()

    def after_train_iteration(self, scalars, step: int) -> None:
        cfg = self.dynamic_config
        if step % cfg.update_every != 0:
            return
        spr = scalars.get("num_samples_per_ray")
        if spr is None:
            return
        spr = float(spr)
        if not np.isfinite(spr) or spr <= 0:
            return
        desired = cfg.target_num_samples / spr
        desired = min(max(desired, cfg.min_num_rays_per_batch),
                      cfg.max_num_rays_per_batch)
        bucket = 1 << round(log2(desired))
        bucket = min(max(bucket, cfg.min_num_rays_per_batch),
                     cfg.max_num_rays_per_batch)
        self.datamanager.num_rays_override = int(bucket)
