"""Profile the bench workloads op-by-op on the current device.

Usage: python tools/profile_bench.py {fwd1024|sample64|train256}

Prints the tools.profile_ops breakdown (per trace line + category +
top ops). Uses the persistent compilation cache so repeat runs skip
recompiles.
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)

import jax.numpy as jnp  # noqa: E402

from tools.profile_ops import profile_fn  # noqa: E402


def _bf16(params):
    return jax.tree_util.tree_map(
        lambda p: p.astype(jnp.bfloat16) if p.dtype == jnp.float32 else p,
        params,
    )


def fwd1024(batch=4):
    from ml_mdm_tpu.config import get_arguments, get_model, get_pipeline

    args = get_arguments(
        args=["--config_path", "configs/models/cc12m_1024x1024.yaml"],
        mode="sampler",
    )
    args.unet_config.conditioning_feature_dim = 2048
    module = get_model(args.model)(3, 3, args.unet_config, dtype=jnp.bfloat16)
    pipeline = get_pipeline(args.model)(module, args.diffusion_config)
    params = _bf16(pipeline.init_params(
        jax.random.PRNGKey(0), image_side=1024, lm_dim=2048, seq_len=32
    ))
    lm = jax.random.normal(jax.random.PRNGKey(1), (batch, 32, 2048),
                           jnp.bfloat16)
    mask = jnp.ones((batch, 32), jnp.bfloat16)
    scales = pipeline.scales
    xs = [
        jax.random.normal(
            jax.random.PRNGKey(2 + i),
            (batch, 1024 * s // scales[0], 1024 * s // scales[0], 3),
            jnp.float32,
        )
        for i, s in enumerate(scales)
    ]
    t = jnp.full((batch,), 999, jnp.int32)
    fwd = jax.jit(
        lambda p, xs, t, lm, mask: pipeline.model(p, xs, t, lm, mask, {})
    )
    jax.block_until_ready(fwd(params, xs, t, lm, mask))
    profile_fn(
        lambda: jax.block_until_ready(fwd(params, xs, t, lm, mask)), top=45
    )


def sample1024(batch=4, steps=25):
    """Profile ONE chunk of the chunked 1024px sampler — the real
    program the bench runs (per-forward profiling misses loop-invariant
    hoisting inside the scan)."""
    from ml_mdm_tpu.config import get_arguments, get_model, get_pipeline

    args = get_arguments(
        args=["--config_path", "configs/models/cc12m_1024x1024.yaml"],
        mode="sampler",
    )
    args.unet_config.conditioning_feature_dim = 2048
    module = get_model(args.model)(3, 3, args.unet_config, dtype=jnp.bfloat16)
    pipeline = get_pipeline(args.model)(module, args.diffusion_config)
    params = _bf16(pipeline.init_params(
        jax.random.PRNGKey(0), image_side=1024, lm_dim=2048, seq_len=32
    ))
    lm = jax.random.normal(jax.random.PRNGKey(1), (batch, 32, 2048),
                           jnp.bfloat16)
    mask = jnp.ones((batch, 32), jnp.bfloat16)
    s = {"lm_outputs": lm, "lm_mask": mask}

    def run(p, k):
        return pipeline.sample_chunked(
            p, batch, s, 1024, k,
            num_inference_steps=steps, resample_steps=True, ddim_eta=1.0,
            chunk_steps=steps, noise_dtype=jnp.bfloat16,
        )

    jax.block_until_ready(run(params, jax.random.PRNGKey(2)))
    profile_fn(
        lambda: jax.block_until_ready(run(params, jax.random.PRNGKey(3))),
        top=45,
    )


def sample64(batch=64, steps=10):
    from __graft_entry__ import _flagship_64px

    pipeline, lm_dim, side = _flagship_64px(scaled=False)
    params = _bf16(pipeline.init_params(
        jax.random.PRNGKey(0), image_side=side, lm_dim=lm_dim, seq_len=32
    ))
    lm = jax.random.normal(jax.random.PRNGKey(1), (batch, 32, lm_dim),
                           jnp.bfloat16)
    mask = jnp.ones((batch, 32), jnp.bfloat16)
    s = {"lm_outputs": lm, "lm_mask": mask}

    def run(p, k):
        return pipeline.sample(
            p, batch, s, side, k,
            num_inference_steps=steps, resample_steps=True, ddim_eta=0.0,
        )

    run_jit = jax.jit(run)
    jax.block_until_ready(run_jit(params, jax.random.PRNGKey(2)))
    profile_fn(
        lambda: jax.block_until_ready(run_jit(params, jax.random.PRNGKey(3))),
        top=45,
    )


def train256(batch=8, remat=os.environ.get("PROFILE_REMAT", "1") == "1"):
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

    holder = {"state": state}

    def thunk():
        holder["state"], mm = step(
            holder["state"], batch_data, jax.random.PRNGKey(2)
        )
        jax.block_until_ready(mm)

    profile_fn(thunk, top=45, warmup=False)


def train1024(batch=2, remat=os.environ.get("PROFILE_REMAT", "1") == "1"):
    from ml_mdm_tpu import trainer
    from ml_mdm_tpu.config import get_arguments, get_model, get_pipeline

    args = get_arguments(
        args=["--config_path", "configs/models/cc12m_1024x1024.yaml"],
        mode="trainer",
    )
    args.unet_config.conditioning_feature_dim = 2048
    module = get_model(args.model)(3, 3, args.unet_config, dtype=jnp.bfloat16)
    pipeline = get_pipeline(args.model)(module, args.diffusion_config)
    params = pipeline.init_params(
        jax.random.PRNGKey(0), image_side=1024, lm_dim=2048, seq_len=32
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
        "images": jnp.zeros((batch, 1024, 1024, 3), jnp.float32),
        "lm_outputs": jnp.zeros((batch, 32, 2048), jnp.float32),
        "lm_mask": jnp.ones((batch, 32), jnp.float32),
    }
    state, m = step(state, batch_data, jax.random.PRNGKey(1))
    jax.block_until_ready(m)

    holder = {"state": state}

    def thunk():
        holder["state"], mm = step(
            holder["state"], batch_data, jax.random.PRNGKey(2)
        )
        jax.block_until_ready(mm)

    profile_fn(thunk, top=45, warmup=False)


if __name__ == "__main__":
    mode = sys.argv[1] if len(sys.argv) > 1 else "fwd1024"
    {"fwd1024": fwd1024, "sample64": sample64, "train256": train256,
     "sample1024": sample1024, "train1024": train1024}[mode]()
