"""jit-compiled training step: loss, grad, clip, optimizer, EMA, NaN skip.

Reference semantics (trainer.py:13-96, train_parallel.py:120-134):
- Adam/AdamW(weight_decay=0, eps=1e-8), linear-warmup-then-constant LR;
- global grad-norm clip (default 2.0);
- VDM loss weighting: (losses * weights).sum() / weights.sum();
- NaN-loss steps are skipped (grads dropped, step not taken) — here via a
  branch-free masked update inside the compiled step;
- EMA (decay 0.9999) updated in-step;
- gradient accumulation over a microbatch axis with a lax.scan (the
  reference loops in Python with DDP no_sync).

Under bf16 training ("fp16" flag kept for YAML compat) compute runs in
bfloat16 with fp32 params/optimizer — no GradScaler needed on TPU.
"""
from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Any, Callable, Dict, Optional

import jax
import jax.numpy as jnp
import optax
from flax import struct

from ml_mdm_tpu.lr_scaler import LRScaler
from ml_mdm_tpu.models.model_ema import EmaConfig, ema_update


@dataclass
class TrainerConfig:
    lr: float = 5e-5
    warmup_steps: int = 5000
    gradient_clip_norm: float = 2.0
    use_adamw: bool = False
    num_gradient_accumulations: int = 1
    loss_factor: float = 1.0
    lr_scaling_factor: float = 1.0
    ema_decay: float = 0.9999
    ema_warmup_steps: int = 0
    # rematerialise the forward pass in backward (jax.checkpoint): trades
    # ~33% extra FLOPs for activation memory — required for 1024px batches
    remat: bool = False
    # selective remat: ALSO save conv outputs whose physical spatial side
    # is <= this (models/layers.py conv_tag). In a nested pyramid the
    # activation MEMORY lives in the huge thin shells while the FLOPs
    # live in the small compute-dense towers — saving the small convs
    # skips most of remat's recompute for almost none of its memory.
    # 0 = classic dots-only policy.
    remat_save_conv_max_side: int = 128
    # store Adam's FIRST moment in bf16 (optax mu_dtype): the per-step
    # param update is bandwidth-bound (~22ms over 477M params at 256px),
    # and mu's read+write is 8 of its 36 bytes/param — bf16 mu trims 4.
    # The second moment stays f32 (squared grads span too much range).
    adam_mu_dtype: str = "float32"


class TrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    ema_params: Any
    opt_state: Any

    @classmethod
    def create(cls, params, optimizer):
        return cls(
            step=jnp.zeros((), jnp.int32),
            params=params,
            # real copy, not an alias: the train step donates the whole
            # state and XLA rejects the same buffer donated twice
            ema_params=jax.tree_util.tree_map(jnp.copy, params),
            opt_state=optimizer.init(params),
        )


def make_optimizer(config: TrainerConfig, freeze_mask=None):
    """Adam/AdamW per the reference recipe (train_parallel.py:120-134).

    Global grad-norm clipping is NOT part of the chain: the train step
    folds the clip scale and the NaN-skip mask into ONE scalar multiply
    on the gradients (see make_train_step) — an optax.clip_by_global_norm
    stage would re-read the full 477M-param gradient tree a second time
    just to recompute the norm the step already has (~2.4ms/step of pure
    HBM traffic on v5e at the 256px recipe).
    """
    schedule = LRScaler(config.lr_scaling_factor).get_lr_schedule(
        config.warmup_steps, config.lr
    )
    mu_dtype = jnp.dtype(config.adam_mu_dtype)
    if config.use_adamw:
        tx = optax.adamw(
            schedule, eps=1e-8, weight_decay=0.0, mu_dtype=mu_dtype
        )
    else:
        tx = optax.adam(schedule, eps=1e-8, mu_dtype=mu_dtype)
    if freeze_mask is not None:
        tx = optax.multi_transform(
            {"train": tx, "freeze": optax.set_to_zero()},
            freeze_mask,
        )
    return tx, schedule


def weighted_loss(losses, weights, loss_factor=1.0):
    if weights is None:
        loss = losses.mean()
    else:
        loss = (losses * weights).sum() / weights.sum()
    return loss * loss_factor


def make_remat_policy(config: TrainerConfig):
    """Saveable-set policy for `jax.checkpoint` under `remat=True`.

    Base: `checkpoint_dots` (matmul outputs saved — attention einsums,
    dense layers; note jax counts CONVOLUTIONS as non-dots, so a pure
    conv net saves nothing under it and the whole forward runs twice).
    With `remat_save_conv_max_side > 0`, conv outputs tagged by
    `models.layers.conv_tag` with physical side <= the threshold are
    saved too (`save_only_these_names`): the nested pyramid's
    compute-dense small towers stop recomputing while its huge
    thin-shell activations still rematerialise."""
    dots = jax.checkpoint_policies.checkpoint_dots
    m = config.remat_save_conv_max_side
    if m <= 0:
        return dots
    names = [f"conv_s{s}" for s in range(1, m + 1)]
    return jax.checkpoint_policies.save_from_both_policies(
        dots, jax.checkpoint_policies.save_only_these_names(*names)
    )


def make_train_step(
    pipeline,
    optimizer,
    config: TrainerConfig,
    compute_dtype=jnp.float32,
):
    """Returns train_step(state, batch, key) -> (state, metrics).

    ``batch`` must contain images (B,H,W,C), lm_outputs, lm_mask (+micros).
    With num_gradient_accumulations > 1, B must be divisible by it; the
    step scans over microbatches accumulating grads before one update.
    """
    ema_cfg = EmaConfig(config.ema_decay, config.ema_warmup_steps)
    accum = config.num_gradient_accumulations

    def loss_fn(params, batch, key):
        if compute_dtype != jnp.float32:
            batch = {
                k: (
                    v.astype(compute_dtype)
                    if hasattr(v, "dtype") and jnp.issubdtype(
                        v.dtype, jnp.floating
                    )
                    else v
                )
                for k, v in batch.items()
            }
        losses, time, x_t, means, tgt, weights = pipeline.get_loss(
            params, batch, key, train=True
        )
        loss = weighted_loss(
            losses.astype(jnp.float32),
            None if weights is None else weights.astype(jnp.float32),
            config.loss_factor,
        )
        return loss, (losses, time)

    if config.remat:
        loss_fn = jax.checkpoint(loss_fn, policy=make_remat_policy(config))
    grad_fn = jax.value_and_grad(loss_fn, has_aux=True)

    def _microbatch(batch, i):
        def slice_one(v):
            if hasattr(v, "shape") and v.ndim > 0:
                mb = v.shape[0] // accum
                return jax.lax.dynamic_slice_in_dim(v, i * mb, mb, axis=0)
            return v

        return {k: slice_one(v) for k, v in batch.items()}

    def train_step(state: TrainState, batch: Dict[str, Any], key):
        if accum == 1:
            (loss, (losses, time)), grads = grad_fn(
                state.params, batch, key
            )
        else:
            keys = jax.random.split(key, accum)

            def body(carry, i):
                acc_grads, acc_loss = carry
                (l, _aux), g = grad_fn(
                    state.params, _microbatch(batch, i), keys[i]
                )
                acc_grads = jax.tree_util.tree_map(
                    lambda a, b: a + b, acc_grads, g
                )
                return (acc_grads, acc_loss + l), None

            zero_grads = jax.tree_util.tree_map(
                jnp.zeros_like, state.params
            )
            (grads, loss_sum), _ = jax.lax.scan(
                body, (zero_grads, 0.0), jnp.arange(accum)
            )
            grads = jax.tree_util.tree_map(lambda g: g / accum, grads)
            loss = loss_sum / accum
            losses, time = None, None

        grad_norm = optax.global_norm(grads)
        ok = jnp.isfinite(loss) & jnp.isfinite(grad_norm)

        # clip (reference: clip_grad_norm_(2.0), trainer.py:52-56) and
        # NaN-skip zeroing folded into ONE scalar multiplier — the
        # multiply fuses into Adam's first read of each gradient, so
        # the whole tree is touched exactly once here
        clip = config.gradient_clip_norm
        if clip and clip > 0:
            scale = jnp.where(
                ok, clip / jnp.maximum(grad_norm, clip), 0.0
            )
        else:
            scale = ok.astype(jnp.float32)
        safe_grads = jax.tree_util.tree_map(
            lambda g: g * scale.astype(g.dtype), grads
        )
        updates, new_opt_state = optimizer.update(
            safe_grads, state.opt_state, state.params
        )
        new_params = optax.apply_updates(state.params, updates)
        # NaN skip: keep old params/opt_state when not ok
        new_params = jax.tree_util.tree_map(
            lambda n, o: jnp.where(ok, n, o), new_params, state.params
        )
        new_opt_state = jax.tree_util.tree_map(
            lambda n, o: jnp.where(ok, n, o) if hasattr(n, "shape") else n,
            new_opt_state,
            state.opt_state,
        )
        new_ema = ema_update(
            state.ema_params, new_params, state.step, ema_cfg
        )
        new_ema = jax.tree_util.tree_map(
            lambda n, o: jnp.where(ok, n, o), new_ema, state.ema_params
        )
        new_state = state.replace(
            step=state.step + ok.astype(jnp.int32),
            params=new_params,
            ema_params=new_ema,
            opt_state=new_opt_state,
        )
        metrics = {
            "loss": loss,
            "grad_norm": grad_norm,
            "skipped": (~ok).astype(jnp.int32),
        }
        return new_state, metrics

    return train_step


# ---------------------------------------------------------------------------
# robust loss tracking (host-side, train_parallel.py:237-252)
# ---------------------------------------------------------------------------


class RobustLossTracker:
    """tanh-clipped EMA of loss + variance for outlier-resistant logging."""

    def __init__(self, wt: float = 0.01, clip: float = 3.0):
        self.wt = wt
        self.clip = clip
        self.exp_avg_loss = 0.0
        self.exp_avg_loss_var = 0.0
        self.best_avg_loss = 1e12
        self._initialized = False

    def load(self, exp_avg_loss, exp_avg_loss_var, best_avg_loss):
        self.exp_avg_loss = exp_avg_loss
        self.exp_avg_loss_var = exp_avg_loss_var
        self.best_avg_loss = best_avg_loss
        self._initialized = True

    def update(self, loss_val: float):
        import numpy as np

        if not self._initialized:
            self.exp_avg_loss = loss_val
            self.exp_avg_loss_var = loss_val**2
            self.best_avg_loss = loss_val
            self._initialized = True
            return
        std = np.sqrt(max(1.0, self.exp_avg_loss_var))
        delta = loss_val - self.exp_avg_loss
        clipped = self.exp_avg_loss + std * self.clip * np.tanh(
            delta / std / self.clip
        )
        self.exp_avg_loss = self.exp_avg_loss * (1 - self.wt) + self.wt * clipped
        self.exp_avg_loss_var = (
            self.exp_avg_loss_var * (1 - self.wt)
            + self.wt * (clipped - self.exp_avg_loss) ** 2
        )
        self.best_avg_loss = min(self.best_avg_loss, self.exp_avg_loss)
