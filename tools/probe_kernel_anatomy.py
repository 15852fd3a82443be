"""Decompose the fused-conv kernel cost on TPU: a minimal pallas kernel
with the same BlockSpec structure, varying (a) number of accumulated
dots, (b) act complexity, (c) scratch usage — to find where the
~3ms gap between the 1.61ms dot roofline and the 4.7ms real kernel
comes from (512^2 x 128ch shape).

Usage: python tools/probe_kernel_anatomy.py
"""
from __future__ import annotations

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")

B, H, W, C = 4, 512, 512, 128
TH = 16


def make(n_taps: int, do_act: bool, silu: bool, via_scratch: bool):
    def kernel(x_ref, w_ref, o_ref, s_ref):
        if do_act:
            v = x_ref[0].astype(jnp.float32) * 1.01 + 0.02
            if silu:
                v = jax.nn.silu(v)
            s_ref[0:TH, :, :] = v.astype(s_ref.dtype)
        elif via_scratch:
            s_ref[0:TH, :, :] = x_ref[0]
        acc = None
        for t in range(n_taps):
            src = s_ref[0:TH, :, :] if (do_act or via_scratch) else x_ref[0]
            tile = src.reshape(TH * W, C)
            part = jax.lax.dot_general(
                tile, w_ref[t], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            acc = part if acc is None else acc + part
        if acc is None:
            acc = s_ref[0:TH, :, :].reshape(TH * W, C).astype(jnp.float32)
        o_ref[0] = acc.reshape(TH, W, C).astype(o_ref.dtype)

    n_i = H // TH
    call = pl.pallas_call(
        functools.partial(kernel),
        grid=(B, n_i),
        in_specs=[
            pl.BlockSpec((1, TH, W, C), lambda bi, ii: (bi, ii, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, TH, W, C),
                               lambda bi, ii: (bi, ii, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, H, W, C), jnp.bfloat16),
        scratch_shapes=[pltpu.VMEM((TH + 2, W, C), jnp.bfloat16)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )
    return call


def bench(label, n_taps, do_act=False, silu=False, via_scratch=False,
          n=30):
    call = make(n_taps, do_act, silu, via_scratch)
    x = (jax.random.normal(jax.random.PRNGKey(0), (B, H, W, C)) * 0.5
         ).astype(jnp.bfloat16)
    w = (jax.random.normal(jax.random.PRNGKey(1), (max(n_taps, 1), C, C))
         * 0.05).astype(jnp.bfloat16)

    @jax.jit
    def loop(x, w):
        def body(c, _):
            y = call(c, w)
            fb = (1e-30 * jnp.sum(y.astype(jnp.float32))).astype(
                jnp.bfloat16)
            return c + fb, None
        c, _ = jax.lax.scan(body, x, None, length=n)
        return jnp.sum(c.astype(jnp.float32))

    float(loop(x, w))
    t0 = time.perf_counter()
    float(loop(x, w))
    dt = (time.perf_counter() - t0) / n * 1e3
    mxu = 2 * B * H * W * C * C * n_taps / 197e12 * 1e3
    print(f"{label:34s} taps={n_taps} act={do_act} silu={silu} "
          f"scr={via_scratch}: {dt:.3f} ms (mxu roofline {mxu:.2f})",
          flush=True)


if __name__ == "__main__":
    bench("dots direct from input block", 9)
    bench("dots direct, 4 taps", 4)
    bench("dots direct, 1 tap", 1)
    bench("copy->scratch + 9 dots", 9, via_scratch=True)
    bench("act->scratch + 9 dots", 9, do_act=True)
    bench("act+silu->scratch + 9 dots", 9, do_act=True, silu=True)
    bench("act+silu->scratch + 4 dots", 4, do_act=True, silu=True)
    bench("act+silu only (0 dots)", 0, do_act=True, silu=True)
    bench("pure copy through scratch", 0, via_scratch=True)
