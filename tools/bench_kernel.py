"""Microbenchmark the fused resnet kernel: N chained calls in one jit
(one device execution), so the tunnel round-trip amortizes away.

Usage: python tools/bench_kernel.py
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")

from ml_mdm_tpu.ops.fused_resnet import (  # noqa: E402
    affine_silu_conv3x3, reference_affine_silu_conv3x3)


def run(B, H, W, C, CO, n=30, **kw):
    k = jax.random.split(jax.random.PRNGKey(0), 6)
    x = (jax.random.normal(k[0], (B, H, W, C)) * 0.5).astype(jnp.bfloat16)
    a = jax.random.normal(k[1], (B, C)) * 0.2 + 1.0
    b = jax.random.normal(k[2], (B, C)) * 0.1
    w = (jax.random.normal(k[3], (3, 3, C, CO)) * 0.05).astype(jnp.bfloat16)
    bias = jax.random.normal(k[4], (CO,)) * 0.1

    import numpy as np
    got = affine_silu_conv3x3(x, a, b, w, bias, **kw)
    ref = reference_affine_silu_conv3x3(x, a, b, w, bias)
    err = float(jnp.max(jnp.abs(got.astype(jnp.float32)
                                - ref.astype(jnp.float32))))

    @jax.jit
    def loop(x):
        def body(c, _):
            y = affine_silu_conv3x3(c, a, b, w, bias, **kw)
            # scalar feedback forces re-execution without shape chaining
            c = c + (0.0 * jnp.sum(y)).astype(c.dtype)
            return c, None
        c, _ = jax.lax.scan(body, x, None, length=n)
        return c

    jax.block_until_ready(loop(x))  # compile
    t0 = time.perf_counter()
    jax.block_until_ready(loop(x))
    dt = (time.perf_counter() - t0) / n * 1e3
    ideal = 2 * B * H * W * 9 * C * CO / 197e12 * 1e3
    print(f"{B}x{H}x{W}x{C}->{CO} {kw}: {dt:.3f} ms "
          f"({100 * ideal / dt:.0f}% MFU) err={err:.4f}", flush=True)


if __name__ == "__main__":
    shapes = [(4, 512, 512, 128, 128), (4, 512, 512, 256, 128),
              (4, 256, 256, 256, 256), (5, 256, 256, 64, 64),
              (5, 256, 256, 128, 64)]
    for s in shapes:
        for th in (8, 16):
            run(*s, tile_h=th)
