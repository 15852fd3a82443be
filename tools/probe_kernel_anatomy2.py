"""Probe 2: which real-kernel feature lifts the 512^2x128 call off the
~1.3ms DMA floor? Adds features one at a time to the 4-dot struct-like
probe: halo-row block specs, lane-parity selects, pl.when column
zeroing, double-buffered scratch with dynamic parity index.

Usage: python tools/probe_kernel_anatomy2.py
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


def make(halos: bool, selects: bool, when_zero: bool, dbuf: bool,
         n_taps: int = 4):
    def kernel(*args):
        idx = 0
        if halos:
            p_ref, x_ref, nx_ref = args[0], args[1], args[2]
            idx = 3
        else:
            x_ref = args[idx]
            idx += 1
        w_ref = args[idx]
        o_ref = args[idx + 1]
        s_ref = args[idx + 2]
        bi = pl.program_id(0)
        ii = pl.program_id(1)
        par = jax.lax.rem(ii, 2) if dbuf else 0

        if when_zero:
            first = jnp.logical_and(bi == 0, ii == 0)

            @pl.when(first)
            def _():
                if dbuf:
                    s_ref[:, :, 0, :] = jnp.zeros_like(s_ref[:, :, 0, :])
                else:
                    s_ref[:, 0, :] = jnp.zeros_like(s_ref[:, 0, :])

        v = jax.nn.silu(x_ref[0].astype(jnp.float32) * 1.01 + 0.02
                        ).astype(jnp.bfloat16)
        if dbuf:
            s_ref[par, 1:TH + 1, 1:W + 1, :] = v
            if halos:
                s_ref[par, 0, 1:W + 1, :] = jax.nn.silu(
                    p_ref[0, 0].astype(jnp.float32) * 1.01 + 0.02
                ).astype(jnp.bfloat16)
                s_ref[par, TH + 1, 1:W + 1, :] = jax.nn.silu(
                    nx_ref[0, 0].astype(jnp.float32) * 1.01 + 0.02
                ).astype(jnp.bfloat16)
            blk = s_ref[1 - par]
        else:
            s_ref[1:TH + 1, 1:W + 1, :] = v
            if halos:
                s_ref[0, 1:W + 1, :] = jax.nn.silu(
                    p_ref[0, 0].astype(jnp.float32) * 1.01 + 0.02
                ).astype(jnp.bfloat16)
                s_ref[TH + 1, 1:W + 1, :] = jax.nn.silu(
                    nx_ref[0, 0].astype(jnp.float32) * 1.01 + 0.02
                ).astype(jnp.bfloat16)
            blk = s_ref[0:TH + 2, :, :]

        acc = None
        if selects:
            lane = jax.lax.broadcasted_iota(jnp.int32, (TH, W + 2, C), 2)
            ei = ((lane >> 1) & 1) == 1
            lane2 = jax.lax.broadcasted_iota(jnp.int32, (TH, W, C), 2)
            ej = (lane2 & 1) == 1
            buf_a = blk[1:TH + 1, :, :]
            buf_b = jnp.where(ei, blk[0:TH, :, :], blk[2:TH + 2, :, :])
            t = 0
            for buf in (buf_a, buf_b):
                xc = buf[:, 1:W + 1, :]
                part = jax.lax.dot_general(
                    xc.reshape(TH * W, C), w_ref[t],
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                acc = part if acc is None else acc + part
                xb = jnp.where(ej, buf[:, 0:W, :], buf[:, 2:W + 2, :])
                acc = acc + jax.lax.dot_general(
                    xb.reshape(TH * W, C), w_ref[t + 1],
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                t += 2
        else:
            for t in range(n_taps):
                tile = blk[t % 3:t % 3 + TH, 1:W + 1, :]
                part = jax.lax.dot_general(
                    tile.reshape(TH * W, C), w_ref[t],
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                acc = part if acc is None else acc + part
        o_ref[0] = acc.reshape(TH, W, C).astype(jnp.bfloat16)

    n_i = H // TH
    in_specs = []
    if halos:
        in_specs.append(pl.BlockSpec(
            (1, 1, W, C),
            lambda bi, ii: (bi, jnp.maximum(ii * TH - 1, 0), 0, 0),
            memory_space=pltpu.VMEM))
    in_specs.append(pl.BlockSpec((1, TH, W, C),
                                 lambda bi, ii: (bi, ii, 0, 0),
                                 memory_space=pltpu.VMEM))
    if halos:
        in_specs.append(pl.BlockSpec(
            (1, 1, W, C),
            lambda bi, ii: (bi, jnp.minimum((ii + 1) * TH, H - 1), 0, 0),
            memory_space=pltpu.VMEM))
    in_specs.append(pl.BlockSpec(memory_space=pltpu.VMEM))
    scratch = (
        pltpu.VMEM((2, TH + 2, W + 2, C), jnp.bfloat16) if dbuf
        else pltpu.VMEM((TH + 2, W + 2, C), jnp.bfloat16)
    )
    call = pl.pallas_call(
        kernel,
        grid=(B, n_i),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, TH, W, C),
                               lambda bi, ii: (bi, ii, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, H, W, C), jnp.bfloat16),
        scratch_shapes=[scratch],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )
    return call


def bench(label, n=30, **kw):
    call = make(**kw)
    x = (jax.random.normal(jax.random.PRNGKey(0), (B, H, W, C)) * 0.5
         ).astype(jnp.bfloat16)
    w = (jax.random.normal(jax.random.PRNGKey(1), (4, C, C)) * 0.05
         ).astype(jnp.bfloat16)

    @jax.jit
    def loop(x, w):
        def body(wc, _):
            if kw.get("halos"):
                y = call(x, x, x, wc)
            else:
                y = call(x, wc)
            fb = (1e-30 * jnp.sum(y[0, 0, 0].astype(jnp.float32))
                  ).astype(jnp.bfloat16)
            return wc + fb, None
        wcf, _ = jax.lax.scan(body, w, None, length=n)
        return jnp.sum(wcf.astype(jnp.float32))

    float(loop(x, w))
    t0 = time.perf_counter()
    float(loop(x, w))
    dt = (time.perf_counter() - t0) / n * 1e3
    print(f"{label:44s}: {dt:.3f} ms", flush=True)


if __name__ == "__main__":
    base = dict(halos=False, selects=False, when_zero=False, dbuf=False)
    bench("base: 4 dots, single buf", **base)
    bench("+halos", **{**base, "halos": True})
    bench("+selects", **{**base, "selects": True})
    bench("+when_zero", **{**base, "when_zero": True})
    bench("+dbuf", **{**base, "dbuf": True})
    bench("halos+selects", **{**base, "halos": True, "selects": True})
    bench("ALL (the real kernel's shape)",
          halos=True, selects=True, when_zero=True, dbuf=True)
