"""Dump the optimized HLO of a bench workload for op-level inspection.

Usage: python tools/dump_hlo.py sample64 > /tmp/sample64.hlo
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)

import jax.numpy as jnp  # noqa: E402


def sample64(batch=64, steps=10):
    from __graft_entry__ import _flagship_64px

    pipeline, lm_dim, side = _flagship_64px(scaled=False)
    params = pipeline.init_params(
        jax.random.PRNGKey(0), image_side=side, lm_dim=lm_dim, seq_len=32
    )
    params = jax.tree_util.tree_map(
        lambda p: p.astype(jnp.bfloat16) if p.dtype == jnp.float32 else p,
        params,
    )
    lm = jax.random.normal(jax.random.PRNGKey(1), (batch, 32, lm_dim),
                           jnp.bfloat16)
    mask = jnp.ones((batch, 32), jnp.bfloat16)
    s = {"lm_outputs": lm, "lm_mask": mask}

    def run(p, k):
        return pipeline.sample(
            p, batch, s, side, k,
            num_inference_steps=steps, resample_steps=True, ddim_eta=0.0,
        )

    compiled = jax.jit(run).lower(params, jax.random.PRNGKey(2)).compile()
    print(compiled.as_text())


if __name__ == "__main__":
    mode = sys.argv[1] if len(sys.argv) > 1 else "sample64"
    {"sample64": sample64}[mode]()
