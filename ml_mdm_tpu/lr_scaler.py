"""LR schedule: linear warmup to peak, then constant
(reference lr_scaler.py:6-28, decay line commented out there too)."""
from __future__ import annotations

import jax.numpy as jnp


class LRScaler:
    def __init__(self, scale: float = 1.0):
        self._scale = scale

    @property
    def scale(self):
        return self._scale

    @scale.setter
    def scale(self, value):
        self._scale = value

    def get_lr_schedule(self, warmup_steps: int, base_lr: float):
        scale = self._scale

        def schedule(step):
            step = jnp.maximum(step, 1)
            warm = scale * step.astype(jnp.float32) / max(1, warmup_steps)
            return base_lr * jnp.where(step < warmup_steps, warm, scale)

        return schedule
