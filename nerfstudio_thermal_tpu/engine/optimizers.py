"""Per-param-group optimizers via optax.

Behavioral spec: reference `nerfstudio/engine/optimizers.py:73-315` — a dict
of {group_name: optimizer+scheduler} over the model's param groups. Here each
group gets its own optax chain (Adam/RAdam + LR schedule); the group
structure is the top level of the param pytree, so `optax.multi_transform`
routes updates without any DDP/GradScaler machinery (bf16 on TPU needs no
loss scaling).
"""

from dataclasses import dataclass, field
from typing import Any, Dict, Optional

import jax
import optax

from nerfstudio_thermal_tpu.engine.schedulers import SchedulerConfig


@dataclass
class OptimizerConfig:
    lr: float = 1e-3
    eps: float = 1e-8
    weight_decay: float = 0.0
    max_norm: Optional[float] = None
    optimizer_type: str = "adam"  # adam | radam

    def make(self, schedule) -> optax.GradientTransformation:
        chain = []
        if self.max_norm is not None:
            chain.append(optax.clip_by_global_norm(self.max_norm))
        if self.optimizer_type == "radam":
            opt = optax.radam(learning_rate=schedule, eps=self.eps)
        else:
            if self.weight_decay > 0:
                opt = optax.adamw(
                    learning_rate=schedule, eps=self.eps, weight_decay=self.weight_decay
                )
            else:
                opt = optax.adam(learning_rate=schedule, eps=self.eps)
        chain.append(opt)
        return optax.chain(*chain)


@dataclass
class AdamOptimizerConfig(OptimizerConfig):
    optimizer_type: str = "adam"


@dataclass
class RAdamOptimizerConfig(OptimizerConfig):
    optimizer_type: str = "radam"


@dataclass
class OptimizerGroupConfig:
    optimizer: OptimizerConfig = field(default_factory=OptimizerConfig)
    scheduler: Optional[SchedulerConfig] = None


def build_optimizer(
    group_configs: Dict[str, OptimizerGroupConfig], params: Dict[str, Any]
) -> optax.GradientTransformation:
    """One optax transformation over the grouped param dict. Groups present in
    params but missing a config fall back to the first config (matching the
    reference's requirement that every group be configured)."""
    transforms = {}
    for name in params.keys():
        gc = group_configs.get(name)
        if gc is None:
            raise KeyError(f"no optimizer config for param group '{name}'")
        schedule = (
            gc.scheduler.make(gc.optimizer.lr) if gc.scheduler is not None else gc.optimizer.lr
        )
        transforms[name] = gc.optimizer.make(schedule)
    labels = {name: name for name in params.keys()}
    return optax.multi_transform(transforms, labels)
