"""Microbenchmark fused-resnet kernel variants at the 1024px-profile
shapes. Timing note: on the tunneled axon runtime block_until_ready
returns before device completion, so each run chains N dependent calls
inside one jit (lax.scan with value feedback) and forces a scalar
readback for the sync.

Usage: python tools/bench_kernel_variants.py
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")

from ml_mdm_tpu.ops.fused_resnet import affine_silu_conv3x3  # noqa: E402


def run(B, H, W, C, CO, n=30, label="", residual=False, proj=False,
        stats=False, n_ops=1, struct=False, **kw):
    # NOTE: with struct=True the random dense kernels below lack the
    # structural zeros pack_conv3x3_kernel produces, so the struct
    # variant computes a DIFFERENT function than the dense run — this
    # probe measures timing only; outputs are not cross-comparable.
    k = jax.random.split(jax.random.PRNGKey(0), 8)
    cs = [C // n_ops] * n_ops
    xs = tuple(
        (jax.random.normal(k[0], (B, H, W, c)) * 0.5).astype(jnp.bfloat16)
        for c in cs
    )
    a_s = tuple(jax.random.normal(k[1], (B, c)) * 0.2 + 1.0 for c in cs)
    b_s = tuple(jax.random.normal(k[2], (B, c)) * 0.1 for c in cs)
    ws = tuple(
        (jax.random.normal(k[3], (3, 3, c, CO)) * 0.05).astype(jnp.bfloat16)
        for c in cs
    )
    bias = jax.random.normal(k[4], (CO,)) * 0.1
    res = (
        (jax.random.normal(k[5], (B, H, W, CO)) * 0.5).astype(jnp.bfloat16)
        if residual else None
    )
    pks = (
        tuple(
            (jax.random.normal(k[6], (c, CO)) * 0.05).astype(jnp.bfloat16)
            for c in cs
        )
        if proj else None
    )
    if n_ops == 1:
        xs, a_s, b_s, ws = xs[0], a_s[0], b_s[0], ws[0]
        pks = pks[0] if proj else None

    @jax.jit
    def loop(xs, a_s, b_s, ws, bias, res, pks):
        def body(c, _):
            out = affine_silu_conv3x3(
                c, a_s, b_s, ws, bias, res,
                emit_stats=stats, proj_kernel=pks, packed_struct=struct,
                **kw,
            )
            y = out[0] if isinstance(out, tuple) else out
            fb = (1e-30 * jnp.sum(y.astype(jnp.float32))).astype(
                jnp.bfloat16
            )
            if isinstance(c, tuple):
                c = tuple(ci + fb for ci in c)
            else:
                c = c + fb
            return c, None
        c, _ = jax.lax.scan(body, xs, None, length=n)
        c0 = c[0] if isinstance(c, tuple) else c
        return jnp.sum(c0.astype(jnp.float32))

    args = (xs, a_s, b_s, ws, bias, res, pks)
    float(loop(*args))  # compile + sync
    t0 = time.perf_counter()
    float(loop(*args))
    dt = (time.perf_counter() - t0) / n * 1e3
    fl = 2 * B * H * W * (9 * C * CO + (C * CO if proj else 0))
    ideal = fl / 197e12 * 1e3
    print(f"{label} {B}x{H}x{W}x{C}->{CO} res={residual} proj={proj} "
          f"stats={stats} ops={n_ops} struct={struct} {kw}: {dt:.3f} ms "
          f"({100 * ideal / dt:.0f}% dense-MFU)", flush=True)


if __name__ == "__main__":
    for struct in (False, True):
        run(4, 512, 512, 128, 128, label="conv1+proj+stats", proj=True,
            stats=True, struct=struct)
        run(4, 512, 512, 128, 128, label="conv2+res", residual=True,
            struct=struct)
        run(4, 512, 512, 256, 128, label="skip2+proj+stats", proj=True,
            stats=True, n_ops=2, struct=struct)
        run(4, 256, 256, 128, 128, label="256sq conv1+proj+stats",
            proj=True, stats=True, struct=struct)
        run(4, 256, 256, 128, 128, label="256sq conv2+res",
            residual=True, struct=struct)
