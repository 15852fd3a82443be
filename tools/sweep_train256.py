"""Throughput sweep for the 256px nested training step on the current
device: batch x remat grid, prints img/s for each point.

Usage: python tools/sweep_train256.py [bs:remat ...]  e.g. 8:1 8:0 16:1
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)

import jax.numpy as jnp  # noqa: E402


def run_point(batch: int, remat: bool):
    from ml_mdm_tpu import trainer
    from ml_mdm_tpu.config import get_arguments, get_model, get_pipeline

    args = get_arguments(
        args=["--config_path", "configs/models/cc12m_256x256.yaml"],
        mode="trainer",
    )
    args.unet_config.conditioning_feature_dim = 2048
    module = get_model(args.model)(3, 3, args.unet_config, dtype=jnp.bfloat16)
    pipeline = get_pipeline(args.model)(module, args.diffusion_config)
    params = pipeline.init_params(
        jax.random.PRNGKey(0), image_side=256, lm_dim=2048, seq_len=32
    )
    tcfg = trainer.TrainerConfig(
        lr=5e-5, warmup_steps=10, gradient_clip_norm=2.0, remat=remat
    )
    opt, _ = trainer.make_optimizer(tcfg)
    state = trainer.TrainState.create(params, opt)
    del params
    step = jax.jit(
        trainer.make_train_step(pipeline, opt, tcfg,
                                compute_dtype=jnp.bfloat16),
        donate_argnums=(0,),
    )
    batch_data = {
        "images": jnp.zeros((batch, 256, 256, 3), jnp.float32),
        "lm_outputs": jnp.zeros((batch, 32, 2048), jnp.float32),
        "lm_mask": jnp.ones((batch, 32), jnp.float32),
    }
    state, m = step(state, batch_data, jax.random.PRNGKey(1))
    jax.block_until_ready(m)
    n = 5
    t0 = time.perf_counter()
    for i in range(n):
        state, m = step(state, batch_data, jax.random.PRNGKey(2 + i))
    jax.block_until_ready(m)
    dt = (time.perf_counter() - t0) / n
    print(
        f"POINT bs{batch} remat={int(remat)}: {1.0/dt:.3f} steps/s = "
        f"{batch/dt:.2f} img/s (vs A100 est 52.1: {batch/dt/52.1:.3f})",
        flush=True,
    )


if __name__ == "__main__":
    points = sys.argv[1:] or ["8:1", "8:0", "16:1", "16:0"]
    for pt in points:
        bs, rm = pt.split(":")
        try:
            run_point(int(bs), bool(int(rm)))
        except Exception as e:  # noqa: BLE001 — sweep survives OOM points
            print(f"POINT bs{bs} remat={rm}: FAILED {type(e).__name__}: "
                  f"{str(e)[:200]}", flush=True)
            break  # a device fault usually wedges the client; stop
