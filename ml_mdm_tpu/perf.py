"""Single source of truth for the performance-path gates.

Every fast-path toggle in the framework — the fused Pallas ResNet conv,
space-to-depth packing, struct-tap kernels, the wcache hoist, the
GroupNorm-stats kernel, attention variants — is declared HERE with its
default, its env override, and what it gates. Call sites read
``perf().field`` instead of scattering ``os.environ.get`` defaults; the
env variables stay the override mechanism (read at TRACE time on every
call, so tests can monkeypatch them), but the names, defaults, and
parsing live in one place.

Gate inventory (defaults tuned on TPU v5e, round 2-5 measurements —
see docs/performance.md for the numbers behind each default):

| Field (env var)                                | Default | Gates |
|------------------------------------------------|---------|-------|
| fused (ML_MDM_TPU_FUSED)                       | auto    | eval-path Pallas fused affine+SiLU+conv3x3 (ops/fused_resnet). auto = on for TPU backend; 0 disables; interpret = pallas interpreter (CPU tests). |
| fused_train (ML_MDM_TPU_FUSED_TRAIN)           | auto    | training-path custom_vjp wrapper of the same kernel. Same values as fused. |
| fused_min_side (ML_MDM_TPU_FUSED_MIN_SIDE)     | 128     | minimum spatial side for the fused conv + Pallas GN-stats paths (at 64px XLA is already at roofline and Pallas boundaries cost layout copies). |
| fused_proj (ML_MDM_TPU_FUSED_PROJ)             | 1       | ResNet conv3 1x1 shortcut rides the fused conv1 kernel (emit_proj) instead of a separate XLA conv. |
| fused_pipelined (ML_MDM_TPU_FUSED_PIPELINED)   | 1       | software-pipelined kernel variant (act on VPU overlaps dots on MXU). |
| pack64_min_side (ML_MDM_TPU_PACK64_MIN_SIDE)   | 256     | minimum side for space-to-depth packing of C<=64 stages (C<=32 stages pack from the model's pack_min_side). |
| pack_max_ch (ML_MDM_TPU_PACK_MAX_CH)           | 64      | maximum channel count eligible for packing (=32 restores the pre-struct-tap gate). |
| wcache (ML_MDM_TPU_WCACHE)                     | auto    | hoist packed-weight transforms out of denoise scans (Model.build_wcache). auto = on for sides >= 256; 1 forces on; 0 off. |
| gn_kernel (ML_MDM_TPU_GN_KERNEL)               | auto    | Pallas streaming GroupNorm-stats kernel (ops/gn_stats). Same values as fused. |
| vjp_chain_bf16_min_side (ML_MDM_TPU_VJP_CHAIN_BF16_MIN_SIDE) | 0 | fused-train backward: compute the silu/affine gradient chain in the primal dtype (bf16) instead of f32 for tensors with spatial side >= this (0 = always f32; f32 measured faster at <=256px sides, but at 1024px-scale the f32 intermediates are 0.5GB of pure HBM traffic each). |
| flash (ML_MDM_TPU_FLASH)                       | 0       | route attention through jax's pipelined flash kernel (opt-in for long sequences; measured slower at this model's L<=1024). |
| bf16_logits (ML_MDM_TPU_BF16_LOGITS)           | 1       | store attention logits in bf16 under bf16 compute (f32 MXU accumulation unchanged). |

Combination safety: the gates are exactness-preserving by construction
(every fast path is an exact rewrite), and tests/test_perf_matrix.py
sweeps the fused x packed x struct x wcache matrix on a small model
asserting all combinations agree to tolerance.
"""
from __future__ import annotations

import os
from dataclasses import dataclass


@dataclass(frozen=True)
class PerfConfig:
    fused: str = "auto"
    fused_train: str = "auto"
    fused_min_side: int = 128
    fused_proj: bool = True
    fused_pipelined: bool = True
    pack64_min_side: int = 256
    pack_max_ch: int = 64
    wcache: str = "auto"
    gn_kernel: str = "auto"
    vjp_chain_bf16_min_side: int = 0
    flash: bool = False
    bf16_logits: bool = True


_DEFAULTS = PerfConfig()


def _mode(name: str, default: str) -> str:
    v = os.environ.get(name, default)
    return v if v in ("0", "1", "auto", "interpret") else default


def perf() -> PerfConfig:
    """Effective gate configuration: declared defaults overridden by the
    ML_MDM_TPU_* env variables. Re-read on every call (trace-time only)
    so tests can monkeypatch the environment."""
    d = _DEFAULTS
    return PerfConfig(
        fused=_mode("ML_MDM_TPU_FUSED", d.fused),
        fused_train=_mode("ML_MDM_TPU_FUSED_TRAIN", d.fused_train),
        fused_min_side=int(
            os.environ.get("ML_MDM_TPU_FUSED_MIN_SIDE", d.fused_min_side)
        ),
        fused_proj=os.environ.get("ML_MDM_TPU_FUSED_PROJ", "1") != "0",
        fused_pipelined=os.environ.get(
            "ML_MDM_TPU_FUSED_PIPELINED", "1"
        ) != "0",
        pack64_min_side=int(
            os.environ.get("ML_MDM_TPU_PACK64_MIN_SIDE", d.pack64_min_side)
        ),
        pack_max_ch=int(
            os.environ.get("ML_MDM_TPU_PACK_MAX_CH", d.pack_max_ch)
        ),
        wcache=_mode("ML_MDM_TPU_WCACHE", d.wcache),
        gn_kernel=_mode("ML_MDM_TPU_GN_KERNEL", d.gn_kernel),
        vjp_chain_bf16_min_side=int(
            os.environ.get(
                "ML_MDM_TPU_VJP_CHAIN_BF16_MIN_SIDE",
                d.vjp_chain_bf16_min_side,
            )
        ),
        flash=os.environ.get("ML_MDM_TPU_FLASH", "0") == "1",
        bf16_logits=os.environ.get("ML_MDM_TPU_BF16_LOGITS", "1") != "0",
    )


def resolve_kernel_mode(value: str):
    """'auto'/'0'/'1'/'interpret' -> None | 'tpu' | 'interpret' for the
    Pallas kernel gates (None = use the plain XLA path)."""
    import jax

    if value == "0":
        return None
    if value == "interpret":
        return "interpret"
    if value == "1":
        return "tpu"
    return "tpu" if jax.default_backend() == "tpu" else None


def describe() -> str:
    """One-line dump of the effective configuration (for logs/benches)."""
    p = perf()
    return " ".join(f"{k}={getattr(p, k)}" for k in p.__dataclass_fields__)
