"""Exponential moving average of parameters (reference model_ema.py:12-55).

Functional pytree form: the EMA lives inside the jitted train step (no
deepcopy, no host sync). Decay is zeroed during warmup, matching
``decay = (counter >= warmup_steps) * decay``.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Any

import jax
import jax.numpy as jnp


@dataclass
class EmaConfig:
    decay: float = 0.9999
    warmup_steps: int = 0


def ema_init(params) -> Any:
    # real copies: EMA and params may both live in a donated train state
    return jax.tree_util.tree_map(jnp.copy, params)


def ema_update(ema_params, params, counter, config: EmaConfig = EmaConfig()):
    """One EMA step. ``counter`` is a traced int scalar."""
    decay = jnp.where(counter >= config.warmup_steps, config.decay, 0.0)
    return jax.tree_util.tree_map(
        lambda e, p: decay * e + (1.0 - decay) * p, ema_params, params
    )
