"""Benchmark: 64px text-to-image sampling throughput, DDIM-50, bf16.

Matches the reference demo preset for 64px (batch 64 @ 50 DDIM steps,
generate_sample.py:546-552) on the flagship cc12m_64x64 architecture with
the whole denoise loop compiled into one lax.scan program.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "samples/sec/chip", "vs_baseline": N}

vs_baseline is relative to A100_TORCH_EST below — a FLOPs-derived
estimate of the torch reference on one A100 for the same preset (the
reference repo publishes no numbers, BASELINE.md). Derivation: the
cc12m_64x64 UNet forward is 358.5 GF/image (XLA cost analysis, bf16),
so one sample at DDIM-50 costs 17.9 TF; an A100 (312 TF bf16 peak)
running eager torch diffusion at a typical 25% MFU sustains 78 TF/s
=> 4.36 samples/s. >1.0 means faster than that estimate.
"""
from __future__ import annotations

import json
import os
import time


def _enable_compile_cache():
    """Persistent XLA compile cache: the 1024px scan programs take
    minutes to compile; repeat bench runs should skip that."""
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)


_enable_compile_cache()

A100_TORCH_EST = 4.36   # samples/sec (see derivation above)
FLOPS_PER_SAMPLE = 358.5e9 * 50  # fwd GF/image x DDIM steps
PEAK_TFLOPS = {"TPU v5 lite": 197.0, "TPU v5": 459.0}


def _mfu(per_sec: float, useful_flops_per_unit: float):
    """Model FLOPs utilisation, ONE formula for every row:

        mfu = throughput x useful_flops_per_unit / chip_peak_flops

    where useful_flops_per_unit is the XLA cost-analysis bf16 FLOPs of
    the UNREMATERIALISED model math per throughput unit (per sample for
    sampling rows = fwd x DDIM steps; per image for training rows =
    fwd+bwd). Remat recompute and other overheads are NOT credited —
    this measures useful work, so it is comparable across presets.
    Constants (XLA cost analysis, BASELINE.md): cc12m_64x64 fwd 358.5
    GF/img; cc12m_256x256 fwd+bwd 1496 GF/img; cc12m_1024x1024 fwd
    1020.8 GF/img (train fwd+bwd = 3x fwd). Returns None off-TPU."""
    import jax

    peak = PEAK_TFLOPS.get(jax.devices()[0].device_kind)
    if not peak:
        return None
    return round(per_sec * useful_flops_per_unit / (peak * 1e12), 3)

# Shared baseline methodology for the secondary rows: A100 eager torch
# at an assumed 25% MFU of the 312 TF bf16 peak sustains 78 TF/s.
A100_EAGER_TFLOPS = 0.25 * 312.0
# 1024px train: fwd is 1020.8 GF/image (XLA cost analysis, bf16);
# fwd+bwd ~ 3x fwd. Our remat adds ~33% FLOPs the ratio does NOT credit.
A100_TORCH_TRAIN1024_EST = A100_EAGER_TFLOPS * 1e12 / (3 * 1020.8e9)
# 256px train: fwd+bwd 1496 GF/image (XLA cost analysis, bf16)
A100_TORCH_TRAIN256_EST = A100_EAGER_TFLOPS * 1e12 / 1496e9
# 1024px sampling: 1020.8 GF/image x 250 DDIM steps
A100_TORCH_SAMPLE1024_EST = A100_EAGER_TFLOPS * 1e12 / (1020.8e9 * 250)


def train_256(batch: int = 16, remat: bool = False,
              mu_dtype: str = "float32"):
    """Secondary benchmark (BASELINE.json: '256px train step/s'): one
    full train step (fwd+bwd+clip+adam+EMA) of the real cc12m_256x256
    nested architecture, bf16 compute, synthetic batch. Default preset
    is the measured v5e sweet spot: bs16, no remat (bs8-20 fit without
    remat; bs24 OOMs; bs20 measured slightly slower than 16).

    Run with: python bench.py --train256 [--batch N] [--remat|--no-remat]
    [--mu-bf16]
    """
    import jax
    import jax.numpy as jnp

    from ml_mdm_tpu import trainer
    from ml_mdm_tpu.config import get_arguments, get_model, get_pipeline

    args = get_arguments(
        args=["--config_path", "configs/models/cc12m_256x256.yaml"],
        mode="trainer",
    )
    args.unet_config.conditioning_feature_dim = 2048
    module = get_model(args.model)(
        3, 3, args.unet_config, dtype=jnp.bfloat16
    )
    pipeline = get_pipeline(args.model)(module, args.diffusion_config)
    params = pipeline.init_params(
        jax.random.PRNGKey(0), image_side=256, lm_dim=2048, seq_len=32
    )
    tcfg = trainer.TrainerConfig(
        lr=5e-5, warmup_steps=10, gradient_clip_norm=2.0, remat=remat,
        adam_mu_dtype=mu_dtype,
    )
    opt, _ = trainer.make_optimizer(tcfg)
    state = trainer.TrainState.create(params, opt)
    del params
    step = jax.jit(
        trainer.make_train_step(pipeline, opt, tcfg,
                                compute_dtype=jnp.bfloat16),
        donate_argnums=(0,),
    )
    b = batch
    batch_data = {
        "images": jnp.zeros((b, 256, 256, 3), jnp.float32),
        "lm_outputs": jnp.zeros((b, 32, 2048), jnp.float32),
        "lm_mask": jnp.ones((b, 32), jnp.float32),
    }
    state, m = step(state, batch_data, jax.random.PRNGKey(1))  # compile
    jax.block_until_ready(m)
    n = 5
    t0 = time.perf_counter()
    for i in range(n):
        state, m = step(state, batch_data, jax.random.PRNGKey(2 + i))
    jax.block_until_ready(m)
    dt = (time.perf_counter() - t0) / n
    print(
        json.dumps(
            {
                "metric": f"256px train step/s (nested_unet, bs{b}, "
                          f"bf16, remat={'on' if remat else 'off'})",
                "value": round(1.0 / dt, 3),
                "unit": "steps/sec/chip",
                "images_per_sec": round(b / dt, 2),
                "vs_baseline": round((b / dt) / A100_TORCH_TRAIN256_EST, 3),
                "mfu": _mfu(b / dt, 1496e9),
            }
        )
    )


def train_1024(batch: int = 2, remat: bool = True,
               save_side: int = 128):
    """1024px nested2 training step (fwd+bwd+clip+adam+EMA), bf16 +
    packed shells. Default preset: bs2 with SELECTIVE remat (the huge
    thin-shell activations rematerialise, conv outputs with side <=
    save_side are saved — trainer.make_remat_policy).
    Run with: python bench.py --train1024 [--batch N] [--no-remat]
    [--save-side S]"""
    import jax
    import jax.numpy as jnp

    from ml_mdm_tpu import trainer
    from ml_mdm_tpu.config import get_arguments, get_model, get_pipeline

    args = get_arguments(
        args=["--config_path", "configs/models/cc12m_1024x1024.yaml"],
        mode="trainer",
    )
    args.unet_config.conditioning_feature_dim = 2048
    module = get_model(args.model)(
        3, 3, args.unet_config, dtype=jnp.bfloat16
    )
    pipeline = get_pipeline(args.model)(module, args.diffusion_config)
    params = pipeline.init_params(
        jax.random.PRNGKey(0), image_side=1024, lm_dim=2048, seq_len=32
    )
    tcfg = trainer.TrainerConfig(
        lr=5e-5, warmup_steps=10, gradient_clip_norm=2.0, remat=remat,
        remat_save_conv_max_side=save_side,
    )
    opt, _ = trainer.make_optimizer(tcfg)
    state = trainer.TrainState.create(params, opt)
    del params
    step = jax.jit(
        trainer.make_train_step(pipeline, opt, tcfg,
                                compute_dtype=jnp.bfloat16),
        donate_argnums=(0,),
    )
    b = batch
    batch_data = {
        "images": jnp.zeros((b, 1024, 1024, 3), jnp.float32),
        "lm_outputs": jnp.zeros((b, 32, 2048), jnp.float32),
        "lm_mask": jnp.ones((b, 32), jnp.float32),
    }
    state, m = step(state, batch_data, jax.random.PRNGKey(1))
    jax.block_until_ready(m)
    n = 3
    t0 = time.perf_counter()
    for i in range(n):
        state, m = step(state, batch_data, jax.random.PRNGKey(2 + i))
    jax.block_until_ready(m)
    dt = (time.perf_counter() - t0) / n
    rlabel = (
        f"selective-remat(save<={save_side})" if remat and save_side > 0
        else ("remat" if remat else "no-remat")
    )
    print(
        json.dumps(
            {
                "metric": f"1024px train step/s (nested2, bs{b}, bf16, "
                          f"{rlabel}, packed shells)",
                "value": round(1.0 / dt, 3),
                "unit": "steps/sec/chip",
                "images_per_sec": round(b / dt, 2),
                "vs_baseline": round(
                    (b / dt) / A100_TORCH_TRAIN1024_EST, 3
                ),
                "mfu": _mfu(b / dt, 3 * 1020.8e9),
            }
        )
    )


def sample_1024(batch: int = 4, steps: int = 250):
    """North-star benchmark: 1024px nested2 sampling, demo preset
    (bs4 @ 250 steps, eta 1 — generate_sample.py:546-552).

    Uses the chunked sampler: one 250-step device execution runs >60s
    at this size, which exceeds the tunneled runtime's RPC deadline and
    surfaces as a TPU device fault (diagnosed r2: a single bs4 forward
    is fine; only the long fused scan dies). Chunks of 25 steps bound
    each execution to a few seconds — numerically identical program.

    Run with: python bench.py --sample1024
    """
    import jax
    import jax.numpy as jnp

    from ml_mdm_tpu.config import get_arguments, get_model, get_pipeline

    args = get_arguments(
        args=["--config_path", "configs/models/cc12m_1024x1024.yaml"],
        mode="sampler",
    )
    args.unet_config.conditioning_feature_dim = 2048
    module = get_model(args.model)(
        3, 3, args.unet_config, dtype=jnp.bfloat16
    )
    pipeline = get_pipeline(args.model)(module, args.diffusion_config)
    params = pipeline.init_params(
        jax.random.PRNGKey(0), image_side=1024, lm_dim=2048, seq_len=32
    )
    params = jax.tree_util.tree_map(
        lambda p: p.astype(jnp.bfloat16) if p.dtype == jnp.float32 else p,
        params,
    )
    lm = jax.random.normal(
        jax.random.PRNGKey(1), (batch, 32, 2048), jnp.bfloat16
    )
    mask = jnp.ones((batch, 32), jnp.bfloat16)

    chunk = int(os.environ.get("BENCH_CHUNK_STEPS", "25"))

    def run(k):
        s = {"lm_outputs": lm, "lm_mask": mask}
        return pipeline.sample_chunked(
            params, batch, s, 1024, k,
            num_inference_steps=steps, resample_steps=True, ddim_eta=1.0,
            chunk_steps=chunk, noise_dtype=jnp.bfloat16,
        )

    out = run(jax.random.PRNGKey(2))
    jax.block_until_ready(out)
    n = 2
    t0 = time.perf_counter()
    for i in range(n):
        out = run(jax.random.PRNGKey(3 + i))
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / n
    sps = batch / dt
    print(
        json.dumps(
            {
                "metric": f"1024px samples/sec/chip (DDIM-{steps}, "
                          f"bs{batch}, bf16, eta1)",
                "value": round(sps, 4),
                "unit": "samples/sec/chip",
                "vs_baseline": round(
                    sps * (steps / 250) / A100_TORCH_SAMPLE1024_EST, 3
                ),
                "mfu": _mfu(sps, 1020.8e9 * steps),
            }
        )
    )


def main():
    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _flagship_64px

    pipeline, lm_dim, side = _flagship_64px(scaled=False)
    key = jax.random.PRNGKey(0)
    params = pipeline.init_params(
        key, image_side=side, lm_dim=lm_dim, seq_len=32
    )
    params = jax.tree_util.tree_map(
        lambda p: p.astype(jnp.bfloat16) if p.dtype == jnp.float32 else p,
        params,
    )

    batch = 64
    steps = 50
    lm = jax.random.normal(
        jax.random.PRNGKey(1), (batch, 32, lm_dim), jnp.bfloat16
    )
    mask = jnp.ones((batch, 32), jnp.bfloat16)
    sample = {"lm_outputs": lm, "lm_mask": mask}

    # params/sample must be jit ARGUMENTS: closed-over arrays are lowered
    # into the HLO as literal constants (hundreds of MB of weights), which
    # bloats the program beyond what remote-compile setups can ship
    def run(p, s, k):
        return pipeline.sample(
            p, batch, s, side, k,
            num_inference_steps=steps, resample_steps=True, ddim_eta=0.0,
        )

    run_jit = jax.jit(run)
    # warmup/compile
    out = run_jit(params, sample, jax.random.PRNGKey(2))
    out.block_until_ready()

    n_iters = 3
    t0 = time.perf_counter()
    for i in range(n_iters):
        out = run_jit(params, sample, jax.random.PRNGKey(3 + i))
    out.block_until_ready()
    dt = (time.perf_counter() - t0) / n_iters

    samples_per_sec = batch / dt
    result = {
        "metric": "64px samples/sec/chip (DDIM-50, bs64, bf16)",
        "value": round(samples_per_sec, 3),
        "unit": "samples/sec/chip",
        "vs_baseline": round(samples_per_sec / A100_TORCH_EST, 3),
    }
    mfu = _mfu(samples_per_sec, FLOPS_PER_SAMPLE)
    if mfu is not None:
        result["mfu"] = mfu
    print(json.dumps(result))


if __name__ == "__main__":
    import sys

    if "--train256" in sys.argv:
        b = (
            int(sys.argv[sys.argv.index("--batch") + 1])
            if "--batch" in sys.argv else 16
        )
        train_256(
            batch=b, remat="--remat" in sys.argv,
            mu_dtype=(
                "bfloat16" if "--mu-bf16" in sys.argv else "float32"
            ),
        )
    elif "--train1024" in sys.argv:
        b = (
            int(sys.argv[sys.argv.index("--batch") + 1])
            if "--batch" in sys.argv else 2
        )
        ss = (
            int(sys.argv[sys.argv.index("--save-side") + 1])
            if "--save-side" in sys.argv else 128
        )
        train_1024(batch=b, remat="--no-remat" not in sys.argv,
                   save_side=ss)
    elif "--sample1024" in sys.argv:
        sample_1024()
    else:
        main()
