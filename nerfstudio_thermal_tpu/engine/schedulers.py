"""Learning-rate schedules as optax-compatible pure functions.

Behavioral spec: reference `nerfstudio/engine/schedulers.py`
(`ExponentialDecayScheduler:109-141` with cosine/linear warmup,
`MultiStepScheduler:77-88`, `CosineDecayScheduler:158-174`).
"""

from dataclasses import dataclass
from typing import Optional, Tuple

import jax.numpy as jnp


@dataclass
class SchedulerConfig:
    def make(self, lr_init: float):
        raise NotImplementedError


@dataclass
class ExponentialDecaySchedulerConfig(SchedulerConfig):
    lr_pre_warmup: float = 1e-8
    lr_final: Optional[float] = None
    warmup_steps: int = 0
    max_steps: int = 100000
    ramp: str = "cosine"

    def make(self, lr_init: float):
        lr_final = self.lr_final if self.lr_final is not None else lr_init

        def schedule(step):
            step = jnp.asarray(step, jnp.float32)
            if self.warmup_steps > 0:
                frac = jnp.clip(step / self.warmup_steps, 0, 1)
                if self.ramp == "cosine":
                    warm = self.lr_pre_warmup + (lr_init - self.lr_pre_warmup) * jnp.sin(
                        0.5 * jnp.pi * frac
                    )
                else:
                    warm = (
                        self.lr_pre_warmup
                        + (lr_init - self.lr_pre_warmup) * step / self.warmup_steps
                    )
            else:
                warm = jnp.asarray(lr_init)
            t = jnp.clip(
                (step - self.warmup_steps) / max(self.max_steps - self.warmup_steps, 1),
                0,
                1,
            )
            decayed = jnp.exp(
                jnp.log(lr_init) * (1 - t) + jnp.log(lr_final) * t
            )
            return jnp.where(step < self.warmup_steps, warm, decayed)

        return schedule


@dataclass
class MultiStepSchedulerConfig(SchedulerConfig):
    max_steps: int = 1000000
    gamma: float = 0.33
    milestones: Tuple[int, ...] = (500000, 750000, 900000)

    def make(self, lr_init: float):
        milestones = jnp.asarray(self.milestones)

        def schedule(step):
            n = jnp.sum(jnp.asarray(step) >= milestones)
            return lr_init * self.gamma**n

        return schedule


@dataclass
class CosineDecaySchedulerConfig(SchedulerConfig):
    warm_up_end: int = 5000
    learning_rate_alpha: float = 0.05
    max_steps: int = 300000

    def make(self, lr_init: float):
        def schedule(step):
            step = jnp.asarray(step, jnp.float32)
            warm = step / max(self.warm_up_end, 1)
            alpha = self.learning_rate_alpha
            progress = (step - self.warm_up_end) / max(self.max_steps - self.warm_up_end, 1)
            decayed = (jnp.cos(jnp.pi * jnp.clip(progress, 0, 1)) + 1.0) * 0.5 * (
                1 - alpha
            ) + alpha
            return lr_init * jnp.where(step < self.warm_up_end, warm, decayed)

        return schedule
