"""Diffusion pipelines: training loss + sampling entry points.

Functional JAX counterparts of the reference pipelines
(/root/reference/ml-mdm-matryoshka/ml_mdm/diffusion.py): the pipeline owns
the Flax module + Sampler and exposes pure functions over explicit params,
so the whole train step / denoise loop jits as one XLA program.

Semantics preserved (reference cites):
- tanh output bound via model_output_scale (diffusion.py:53-87)
- loss-target conversion when loss_target_type != prediction_type
  (diffusion.py:123-136)
- VDM loss weighting toggle (diffusion.py:144-168)
- nested: image pyramid by avg-pool with re-randomised noise at low res
  (diffusion.py:332-356), per-scale shifted gammas, use_double_loss +
  multi_res_weights (diffusion.py:363-387), mixed_ratio partial batches
  (diffusion.py:262-274, 308-313) as *static* slices under jit.

The ``no_use_residual=False`` low-res residual recombination branch is
broken in the reference (unbound ``ratio``, diffusion.py:288 — SURVEY.md
quirk #2; every shipped config sets no_use_residual=true). Here it is
implemented as intended (NestedModel._low_res_residual: low-res x0
prediction, clip, bicubic upsample, recombine in prediction space), with
mixed-ratio batches explicitly rejected.
"""
from __future__ import annotations

import logging
import os
from dataclasses import dataclass, field
from typing import Any, Dict, List, Optional

import numpy as np

import jax
import jax.numpy as jnp

from ml_mdm_tpu import config as config_mod
from ml_mdm_tpu import samplers
from ml_mdm_tpu.samplers import NestedSampler, Sampler, SamplerConfig


@config_mod.register_pipeline_config("unet")
@dataclass
class DiffusionConfig:
    sampler_config: SamplerConfig = field(default_factory=SamplerConfig)
    model_output_scale: float = 0.0
    use_vdm_loss_weights: bool = True


def avg_pool_nhwc(x: jnp.ndarray, r: int) -> jnp.ndarray:
    """r x r average pooling in NHWC via reshape (exact, MXU-free)."""
    if r == 1:
        return x
    b, h, w, c = x.shape
    x = x.reshape(b, h // r, r, w // r, r, c)
    return x.mean(axis=(2, 4))


class Model:
    """Wraps the Flax vision module as model_fn(params)(x_t, t, ...) with the
    optional tanh output bound."""

    def __init__(self, vision_module, diffusion_config: DiffusionConfig):
        self.vision_module = vision_module
        self.diffusion_config = diffusion_config
        self._output_scale = diffusion_config.model_output_scale

    @property
    def input_channels(self):
        return self.vision_module.input_channels

    @staticmethod
    def _unbundle(params):
        """Sampling paths may pass {'__params__', '__wcache__'} bundles
        (precomputed weight transforms — see build_wcache)."""
        if isinstance(params, dict) and "__wcache__" in params:
            return params["__params__"], params["__wcache__"]
        return params, None

    def _variables(self, params):
        params, wcache = self._unbundle(params)
        variables = {"params": params}
        if wcache is not None:
            variables["wcache"] = wcache
        return variables

    def build_wcache(self, params, x_t, times, lm_outputs, lm_mask,
                     micros):
        """One forward under mutable=['wcache']: the model compute gets
        dead-code-eliminated by XLA (only the collection is kept), so
        this reduces to just the packed-weight transforms — computed
        once per program instead of per denoise step (see
        models/layers.wcached). Self-jitted (cached on the Model) so
        eager callers like sample_chunked don't run the builder forward
        op-by-op. Returns a bundle for the model calls."""
        jitted = getattr(self, "_build_wcache_jit", None)
        if jitted is None:
            def _build(params, x_t, times, lm_outputs, lm_mask, micros):
                _, vs = self.vision_module.apply(
                    {"params": params}, x_t, times, lm_outputs, lm_mask,
                    micros, train=False, mutable=["wcache"],
                )
                return vs.get("wcache", {})

            jitted = self._build_wcache_jit = jax.jit(_build)
        wcache = jitted(params, x_t, times, lm_outputs, lm_mask, micros)
        return {"__params__": params, "__wcache__": wcache}

    def __call__(self, params, x_t, times, lm_outputs, lm_mask, micros,
                 train=False, dropout_rng=None, packed_io=False):
        rngs = (
            {"dropout": dropout_rng}
            if (train and dropout_rng is not None)
            else None
        )
        kw = {"packed_io": True} if packed_io else {}
        out = self.vision_module.apply(
            self._variables(params), x_t, times, lm_outputs, lm_mask,
            micros, train=train, rngs=rngs, **kw,
        )
        if self._output_scale != 0:
            s = self._output_scale
            if isinstance(out, list):
                out = [jnp.tanh(o / s) * s for o in out]
            else:
                out = jnp.tanh(out / s) * s
        return out

    def fn(self, params, train=False, packed_io=False):
        return lambda x, t, lm, mask, micros: self(
            params, x, t, lm, mask, micros, train=train, packed_io=packed_io
        )

    @property
    def packed_apply(self):
        """Stable-identity weight-explicit caller with ``packed_io=True``
        (the hi-res carry stays space-to-depth packed across the denoise
        scan — see UNet.packs_input). Cached so jitted samplers that hash
        ``model_apply`` by object identity reuse their compiled step."""
        cached = getattr(self, "_packed_apply", None)
        if cached is None:
            def _apply(p, x, t, lm, mask, micros):
                return self(p, x, t, lm, mask, micros, packed_io=True)

            self._packed_apply = cached = _apply
        return cached


@config_mod.register_pipeline("unet")
class Diffusion:
    def __init__(self, vision_module, diffusion_config: DiffusionConfig):
        logging.info(f"Diffusion config: {diffusion_config}")
        self.model = Model(vision_module, diffusion_config)
        self.sampler = Sampler(diffusion_config.sampler_config)
        self._config = diffusion_config

    @property
    def vision_module(self):
        return self.model.vision_module

    def init_params(self, key, image_side=64, lm_dim=None, seq_len=32,
                    batch=1):
        mod = self.vision_module
        lm_dim = lm_dim or max(mod.input_conditioning_feature_dim, 8)
        x = jnp.zeros((batch, image_side, image_side, mod.input_channels))
        t = jnp.zeros((batch,), dtype=jnp.int32)
        lm = jnp.zeros((batch, seq_len, lm_dim))
        mask = jnp.ones((batch, seq_len))
        variables = jax.jit(mod.init)(key, x, t, lm, mask, {})
        return variables["params"]

    def get_micro_conditioning(self, sample: Dict[str, Any]) -> Dict[str, Any]:
        conditions = self.vision_module.conditions
        if conditions is None:
            return {}
        return {k: sample[k] for k in conditions if k in sample}

    def get_pred_for_training(self, x_t, pred, g):
        sc = self._config.sampler_config
        if sc.loss_target_type == sc.prediction_type:
            return pred
        x0, _ = self.sampler.get_x0_eps_from_pred(
            x_t, pred, g, sc.prediction_type
        )
        return self.sampler.get_pred_from_x0_xt(
            x_t, x0, g, sc.loss_target_type
        )

    def get_loss(self, params, sample: Dict[str, Any], key, train=True):
        images = sample["images"]
        lm_outputs, lm_mask = sample["lm_outputs"], sample["lm_mask"]

        key, k_drop = jax.random.split(key)
        eps, g, g_last, weights, time = self.sampler.get_eps_time(key, images)
        if not self._config.use_vdm_loss_weights:
            weights = None

        x_t = self.sampler.get_xt(
            self.sampler.get_image_rescaled(images), eps, g
        )
        micros = self.get_micro_conditioning(sample)
        means = self.model(params, x_t, time, lm_outputs, lm_mask, micros,
                           train=train, dropout_rng=k_drop)
        tgt = self.sampler.get_prediction_targets(
            images, eps, g, g_last,
            self._config.sampler_config.loss_target_type,
        )
        pred = self.get_pred_for_training(x_t, means, g)
        loss = jnp.mean(
            jnp.square(pred - tgt), axis=(1, 2, 3), dtype=jnp.float32
        )
        return loss, time, x_t, means, tgt, weights

    def get_noise(self, key, num_examples, image_side, dtype=jnp.float32):
        c = self.vision_module.input_channels
        return jax.random.normal(
            key, (num_examples, image_side, image_side, c), dtype=dtype
        )

    def _packed_io(self, image_side: int) -> bool:
        """Whether to keep the (hi-res) sampling carry space-to-depth
        packed across the whole denoise loop: the per-step pack/unpack
        boundary relayouts then happen once per sample instead of once
        per step (profiled ~6% of the 1024px sampling step, r3)."""
        fn = getattr(self.vision_module, "packs_input", None)
        return bool(fn is not None and fn(image_side))

    def _maybe_wcache(self, params, noise, num_examples, sample, micros,
                      image_side):
        """Precompute the packed-weight transforms once per sampling
        program (Model.build_wcache) and bundle them with the params.
        Auto-gated to sides where packing can engage; ML_MDM_TPU_WCACHE
        forces on (1) / off (0). Under an outer jit the builder forward
        dead-code-eliminates to just the transforms."""
        from ml_mdm_tpu.perf import perf

        v = perf().wcache
        if v == "0" or (v != "1" and image_side < 256):
            return params
        # the cached transforms are weight-only (batch-independent), so
        # the builder forward runs at batch 1 — also tolerant of callers
        # whose conditioning batch is smaller than num_examples
        # (broadcast pattern)
        t0 = jnp.zeros((1,), jnp.int32)
        return self.model.build_wcache(
            params,
            jax.tree_util.tree_map(lambda a: a[:1], noise),
            t0,
            sample["lm_outputs"][:1], sample["lm_mask"][:1],
            {k: val[:1] for k, val in micros.items()},
        )

    def sample(self, params, num_examples, sample, image_side, key, **kwargs):
        k_noise, k_loop = jax.random.split(key)
        noise = self.get_noise(k_noise, num_examples, image_side)
        micros = self.get_micro_conditioning(sample)
        packed = self._packed_io(image_side)
        params = self._maybe_wcache(
            params, noise, num_examples, sample, micros, image_side
        )
        return self.sampler.sample(
            self.model.fn(params, packed_io=packed),
            noise,
            sample["lm_outputs"],
            sample["lm_mask"],
            micros,
            k_loop,
            packed_hi=packed,
            **kwargs,
        )

    def sample_stream(self, params, num_examples, sample, image_side, key,
                      **kwargs):
        k_noise, k_loop = jax.random.split(key)
        noise = self.get_noise(k_noise, num_examples, image_side)
        micros = self.get_micro_conditioning(sample)
        packed = self._packed_io(image_side)
        params = self._maybe_wcache(
            params, noise, num_examples, sample, micros, image_side
        )
        return self.sampler.sample_stream(
            self.model.fn(params, packed_io=packed),
            noise,
            sample["lm_outputs"],
            sample["lm_mask"],
            micros,
            k_loop,
            params=params,
            model_apply=self.model.packed_apply if packed else self.model,
            packed_hi=packed,
            **kwargs,
        )

    def sample_chunked(self, params, num_examples, sample, image_side, key,
                       noise_dtype=jnp.float32, **kwargs):
        """Like ``sample`` but host-driven in bounded device chunks; jits
        internally with params as arguments (do NOT wrap in jax.jit)."""
        k_noise, k_loop = jax.random.split(key)
        noise = self.get_noise(
            k_noise, num_examples, image_side, dtype=noise_dtype
        )
        micros = self.get_micro_conditioning(sample)
        packed = self._packed_io(image_side)
        params = self._maybe_wcache(
            params, noise, num_examples, sample, micros, image_side
        )
        return self.sampler.sample_chunked(
            params,
            self.model.packed_apply if packed else self.model,
            noise,
            sample["lm_outputs"],
            sample["lm_mask"],
            micros,
            k_loop,
            packed_hi=packed,
            **kwargs,
        )

    def partial_diffusion(self, params, images, t, sample, key, **kwargs):
        """img2img: noise images to level t, then denoise from t."""
        k_eps, k_loop = jax.random.split(key)
        b = images.shape[0]
        time = jnp.full((b,), t, dtype=jnp.int32)
        g = self.sampler.read_gamma(time)
        eps = jax.random.normal(k_eps, images.shape, images.dtype)
        x_t = self.sampler.get_xt(
            self.sampler.get_image_rescaled(images), eps, g
        )
        micros = self.get_micro_conditioning(sample)
        packed = self._packed_io(images.shape[1])
        params = self._maybe_wcache(
            params, x_t, images.shape[0], sample, micros, images.shape[1]
        )
        return self.sampler.sample(
            self.model.fn(params, packed_io=packed),
            x_t,
            sample["lm_outputs"],
            sample["lm_mask"],
            micros,
            k_loop,
            t_start=t,
            packed_hi=packed,
            **kwargs,
        )


# ---------------------------------------------------------------------------
# Nested (multi-resolution) pipeline
# ---------------------------------------------------------------------------


@config_mod.register_pipeline_config("nested_unet")
@dataclass
class NestedDiffusionConfig(DiffusionConfig):
    use_double_loss: bool = False
    multi_res_weights: Optional[str] = None
    no_use_residual: bool = False
    use_random_interp: bool = False
    mixed_ratio: Optional[str] = None
    random_downsample: bool = False
    average_downsample: bool = False
    mid_downsample: bool = False


class NestedModel(Model):
    def __init__(self, vision_module, diffusion_config):
        super().__init__(vision_module, diffusion_config)
        self.sampler = None  # wired by NestedDiffusion

    def _low_res_residual(self, x_t, p_t, times):
        """Low-res x0 recombination into the hi-res prediction.

        The reference's branch (diffusion.py:277-292) is unreachable-broken
        (unbound ``ratio``, gamma argument passed as raw timesteps —
        SURVEY.md quirk #2); this is the deliberate, working resolution of
        its intent: predict x0 at the low scale, clip, bicubic-upsample,
        and add it to the hi-res prediction in prediction space.
        """
        assert self.diffusion_config.mixed_ratio is None, \
            "residual recombination does not support mixed batches"
        x_hi, x_lo = x_t[0], x_t[1]
        pred, pred_low = p_t[0], p_t[1]
        smp = self.sampler
        scales = list(self.vision_module.nest_ratio) + [1]
        g_base = smp.read_gamma(times + 1)
        g_list = smp.get_gammas(g_base, scales)
        x0_low = smp.get_x0_eps_from_pred(
            x_lo, pred_low, g_list[1], return_eps=False
        )
        x0_low = jnp.clip(x0_low, -1.0, 1.0)
        ratio = x_hi.shape[1] // x_lo.shape[1]
        b, h, w, c = x0_low.shape
        x0_up = jax.image.resize(
            x0_low, (b, h * ratio, w * ratio, c), method="cubic"
        ) / ratio
        pred = pred + smp.get_pred_from_x0_xt(x_hi, x0_up, g_list[0])
        return [pred, pred_low] + list(p_t[2:])

    def __call__(self, params, x_t, times, lm_outputs, lm_mask, micros,
                 train=False, mixed_ratio=None, dropout_rng=None,
                 packed_io=False):
        batch = x_t[0].shape[0]
        if mixed_ratio is not None:
            x_t = [x[: int(m * x.shape[0])] for x, m in zip(x_t, mixed_ratio)]
        rngs = (
            {"dropout": dropout_rng}
            if (train and dropout_rng is not None)
            else None
        )
        kw = {"packed_io": True} if packed_io else {}
        p_t = self.vision_module.apply(
            self._variables(params), x_t, times, lm_outputs, lm_mask,
            micros, train=train, rngs=rngs, **kw,
        )
        if self._output_scale != 0:
            s = self._output_scale
            p_t = [jnp.tanh(p / s) * s for p in p_t]
        if mixed_ratio is not None:
            p_t = [
                jnp.concatenate(
                    [p, jnp.zeros((batch - p.shape[0],) + p.shape[1:], p.dtype)],
                    axis=0,
                )
                if p.shape[0] < batch
                else p
                for p in p_t
            ]
        if not self.diffusion_config.no_use_residual:
            assert not packed_io, (
                "packed sampling carry is gated off when residual "
                "recombination is active (it needs the unpacked layout)"
            )
            p_t = self._low_res_residual(x_t, p_t, times)
        return p_t

    def fn(self, params, train=False, packed_io=False):
        # sampling path: no mixed-ratio slicing
        return lambda x, t, lm, mask, micros: self(
            params, x, t, lm, mask, micros, train=train, packed_io=packed_io
        )


@config_mod.register_pipeline("nested_unet")
class NestedDiffusion(Diffusion):
    def __init__(self, vision_module, diffusion_config: NestedDiffusionConfig):
        logging.info(f"Diffusion config: {diffusion_config}")
        self.model = NestedModel(vision_module, diffusion_config)
        self.sampler = NestedSampler(diffusion_config.sampler_config)
        self.model.sampler = self.sampler
        self._config = diffusion_config

        self.mixed_ratio = None
        if self._config.mixed_ratio:
            mr = np.cumsum(
                np.asarray(
                    [float(x) for x in str(self._config.mixed_ratio).split(":")]
                )
            )
            self.mixed_ratio = (mr / mr[-1]).tolist()

    @property
    def scales(self):
        return list(self.vision_module.nest_ratio) + [1]

    def init_params(self, key, image_side=256, lm_dim=None, seq_len=32,
                    batch=1):
        mod = self.vision_module
        lm_dim = lm_dim or max(mod.input_conditioning_feature_dim, 8)
        scales = self.scales
        xs = [
            jnp.zeros(
                (
                    batch,
                    image_side * s // scales[0],
                    image_side * s // scales[0],
                    mod.input_channels,
                )
            )
            for s in scales
        ]
        t = jnp.zeros((batch,), dtype=jnp.int32)
        lm = jnp.zeros((batch, seq_len, lm_dim))
        mask = jnp.ones((batch, seq_len))
        variables = jax.jit(mod.init)(key, xs, t, lm, mask, {})
        return variables["params"]

    def get_loss(self, params, sample: Dict[str, Any], key, train=True):
        images = sample["images"]
        lm_outputs, lm_mask = sample["lm_outputs"], sample["lm_mask"]
        micros = self.get_micro_conditioning(sample)

        scales = self.scales
        ratios = [scales[0] // s for s in scales]
        istime = [False] + list(self.vision_module.is_temporal) \
            if hasattr(self.vision_module, "is_temporal") else [False] * len(scales)

        # hi-res level in the FLAT packed (B, H/2, (W/2)*4C) form for the
        # whole loss boundary, mirroring the sampling carry (_pack_hi):
        # the packed NHWC tensor's thin trailing dim pads to 128 lanes in
        # XLA tiled layouts (10.7x physical bytes at 12 channels), so the
        # x_t build, the loss diff and their backward all paid 10.7x HBM
        # traffic — and the model-side pack/unpack transposes ran at
        # 1024² every step (fwd AND bwd). Here images pack once, eps is
        # drawn directly in flat form (iid normals — any arrangement is
        # distributionally identical), and the packed NHWC view exists
        # only at the model boundary. MSE is permutation-invariant, so
        # the loss is the same quantity as the unpacked computation.
        packed0 = train and self._packed_io(images.shape[1])
        img0 = images
        if packed0:
            from ml_mdm_tpu.samplers import _pack_hi

            img0 = _pack_hi(images)

        k_et, k_renoise, k_drop = jax.random.split(key, 3)
        eps, g, g_last, weights, time = self.sampler.get_eps_time(
            k_et, img0
        )
        if not self._config.use_vdm_loss_weights:
            weights = None

        # image pyramid (avg-pool); the low-res eps are fresh normals at
        # each level (drawn directly at the pyramid shapes below — the
        # reference pools eps then immediately re-randomises, so the
        # pooled values are dead; diffusion.py:255-268 semantics kept)
        _images, T = [images], 4
        for iz, (r, ist) in enumerate(zip(ratios, istime)):
            if iz == 0:
                continue
            rr = r // ratios[iz - 1]
            x = _images[-1]
            if ist:
                # temporal: subsample frames from the (n h)(m w) packing
                b, h, w, c = x.shape
                n = T
                x = x.reshape(b, n, h // n, n, w // n, c)
                x = x.transpose(0, 1, 3, 2, 4, 5).reshape(
                    b, n * n, h // n, w // n, c
                )
                x = x[:, :: (r * r)]
                T = T // rr
                x = x.reshape(b, T, T, h // n, w // n, c)
                x = x.transpose(0, 1, 3, 2, 4, 5).reshape(
                    b, T * (h // n), T * (w // n), c
                )
            else:
                x = avg_pool_nhwc(x, rr)
            _images.append(x)
        images_list = _images
        images_list[0] = img0

        g_list = list(self.sampler.get_gammas(g, scales))
        g_last_list = list(self.sampler.get_gammas(g_last, scales))
        if packed0:
            # rank-3 broadcast shape for the flat level-0 tensors
            g_list[0] = g_list[0][..., 0]
            g_last_list[0] = g_last_list[0][..., 0]

        renoise_keys = jax.random.split(k_renoise, len(images_list))
        eps_list = [eps] + [
            jax.random.normal(renoise_keys[i], images_list[i].shape, eps.dtype)
            for i in range(1, len(images_list))
        ]

        x_t = self.sampler.get_xt(images_list, eps_list, g_list, scales)
        xs_in = list(x_t)
        if packed0:
            b0, h0, wc0 = xs_in[0].shape
            xs_in[0] = xs_in[0].reshape(b0, h0, h0, wc0 // h0)
        p_t = self.model(
            params, xs_in, time, lm_outputs, lm_mask, micros, train=train,
            mixed_ratio=self.mixed_ratio, dropout_rng=k_drop,
            packed_io=packed0,
        )
        if packed0:
            p_t = [
                p_t[0].reshape(p_t[0].shape[0], h0, wc0)
            ] + list(p_t[1:])

        tgt = self.sampler.get_prediction_targets(
            images_list, eps_list, g_list, g_last_list, scales,
            self._config.sampler_config.loss_target_type,
        )
        pred = [
            self.get_pred_for_training(x, p, gi)
            for x, p, gi in zip(x_t, p_t, g_list)
        ]

        if self._config.multi_res_weights is not None:
            assert self._config.use_double_loss, (
                "multi_res_weights only makes sense with use_double_loss"
            )
            w = [float(v) for v in str(self._config.multi_res_weights).split(":")]
        else:
            w = [1.0] * len(x_t)

        loss = 0.0
        for i in range(len(x_t)):
            if i == 0 or self._config.use_double_loss:
                loss_i = jnp.mean(
                    jnp.square(pred[i] - tgt[i]),
                    axis=tuple(range(1, pred[i].ndim)),
                    dtype=jnp.float32,
                )
                if self.mixed_ratio is not None:
                    loss_i = loss_i / self.mixed_ratio[i]
                    keep = int(self.mixed_ratio[i] * loss_i.shape[0])
                    mask = (
                        jnp.arange(loss_i.shape[0]) < keep
                    ).astype(loss_i.dtype)
                    loss_i = loss_i * mask
            else:
                loss_i = jnp.mean(pred[i]) * 0.0
            loss = loss + loss_i * w[i]
        return loss, time, x_t[0], pred[0], tgt[0], weights

    def get_noise(self, key, num_examples, image_side, dtype=jnp.float32):
        return self.sampler.init_noise(
            key,
            num_examples,
            self.vision_module.input_channels,
            image_side,
            self.scales,
            dtype=dtype,
        )

    def _packed_io(self, image_side: int) -> bool:
        # residual recombination reads the unpacked hi-res layout
        if not self._config.no_use_residual:
            return False
        return super()._packed_io(image_side)

    def sample(self, params, num_examples, sample, image_side, key, **kwargs):
        k_noise, k_loop = jax.random.split(key)
        noise = self.get_noise(k_noise, num_examples, image_side)
        micros = self.get_micro_conditioning(sample)
        packed = self._packed_io(image_side)
        params = self._maybe_wcache(
            params, noise, num_examples, sample, micros, image_side
        )
        return self.sampler.sample(
            self.model.fn(params, packed_io=packed),
            noise,
            sample["lm_outputs"],
            sample["lm_mask"],
            micros,
            k_loop,
            scales=self.scales,
            packed_hi=packed,
            **kwargs,
        )

    def sample_stream(self, params, num_examples, sample, image_side, key,
                      **kwargs):
        k_noise, k_loop = jax.random.split(key)
        noise = self.get_noise(k_noise, num_examples, image_side)
        micros = self.get_micro_conditioning(sample)
        packed = self._packed_io(image_side)
        params = self._maybe_wcache(
            params, noise, num_examples, sample, micros, image_side
        )
        return self.sampler.sample_stream(
            self.model.fn(params, packed_io=packed),
            noise,
            sample["lm_outputs"],
            sample["lm_mask"],
            micros,
            k_loop,
            scales=self.scales,
            params=params,
            model_apply=self.model.packed_apply if packed else self.model,
            packed_hi=packed,
            **kwargs,
        )

    def sample_chunked(self, params, num_examples, sample, image_side, key,
                       noise_dtype=jnp.float32, **kwargs):
        k_noise, k_loop = jax.random.split(key)
        noise = self.get_noise(
            k_noise, num_examples, image_side, dtype=noise_dtype
        )
        micros = self.get_micro_conditioning(sample)
        packed = self._packed_io(image_side)
        params = self._maybe_wcache(
            params, noise, num_examples, sample, micros, image_side
        )
        return self.sampler.sample_chunked(
            params,
            self.model.packed_apply if packed else self.model,
            noise,
            sample["lm_outputs"],
            sample["lm_mask"],
            micros,
            k_loop,
            scales=self.scales,
            packed_hi=packed,
            **kwargs,
        )
