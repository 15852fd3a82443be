"""Profile a jitted callable on the current JAX device and print the
top ops by self time.

Usage (library):
    from tools.profile_ops import profile_fn
    profile_fn(lambda: jax.block_until_ready(run(args)), top=30)

Parses the captured xplane directly via jax.profiler.ProfileData — no
TensorBoard UI needed (works over the axon tunnel).
"""
from __future__ import annotations

import collections
import glob
import os
import re
import tempfile


def _device_line_events(xspace):
    """Yield (line_name, event_name, duration_ns) from device planes."""
    for plane in xspace.planes:
        # TPU device planes are named like '/device:TPU:0'; host planes
        # like '/host:CPU' carry python/runtime noise we skip
        if "TPU" not in plane.name and "device" not in plane.name.lower():
            continue
        for line in plane.lines:
            for ev in line.events:
                yield line.name, ev.name, ev.duration_ns


_OPKIND_RE = re.compile(r"=\s*(?:\([^)]*\)|\S+)\s+([a-z][\w\-]*)\(")


def _opkind(name: str) -> str:
    """Extract the HLO op kind ('copy', 'fusion', 'custom-call', ...)
    from a full instruction string; falls back to the lhs name."""
    m = _OPKIND_RE.search(name)
    if m:
        return m.group(1)
    return name.split("=")[0].strip().lstrip("%").split(".")[0]


def _category(name: str) -> str:
    kind = _opkind(name)
    if kind in ("copy", "copy-start", "copy-done", "transpose",
                "bitcast-convert"):
        return "copy/layout"
    if kind in ("convolution",):
        return "conv"
    if kind in ("dot",):
        return "matmul"
    if kind in ("custom-call",):
        return "custom-call(pallas)"
    if kind in ("dynamic-slice", "dynamic-update-slice", "slice"):
        return "slice"
    if kind in ("reduce", "reduce-window"):
        return "reduce"
    if kind in ("rng", "rng-bit-generator"):
        return "rng"
    if kind in ("all-reduce", "all-gather", "collective-permute",
                "reduce-scatter"):
        return "collective"
    if kind == "fusion":
        return "fusion(elementwise/mixed)"
    return f"other({kind})"


def profile_fn(thunk, top: int = 30, warmup: bool = True):
    """Run thunk under the JAX profiler; print top ops by total time.

    thunk must block on its result (jax.block_until_ready).
    Returns {op_name: total_ms} aggregated.
    """
    import jax

    if warmup:
        thunk()
    tmp = tempfile.mkdtemp(prefix="jaxprof_")
    with jax.profiler.trace(tmp):
        thunk()
    path = None
    for p in glob.glob(
        os.path.join(tmp, "**", "*.xplane.pb"), recursive=True
    ):
        path = p
    assert path, f"no xplane capture under {tmp}"
    from jax.profiler import ProfileData

    xspace = ProfileData.from_serialized_xspace(
        open(path, "rb").read()
    )
    by_line = collections.defaultdict(collections.Counter)
    for line_name, name, dur in _device_line_events(xspace):
        base = re.sub(r"\.\d+$", "", name)
        by_line[line_name][base] += dur
    # per trace line: total + category breakdown; the 'XLA Ops' line is
    # the per-op truth (module/step lines double-count whole programs)
    for line_name, agg in sorted(by_line.items()):
        total = sum(agg.values())
        cats = collections.Counter()
        for name, dur in agg.items():
            cats[_category(name)] += dur
        print(f"\n== line '{line_name}': {total/1e6:.2f} ms,"
              f" {len(agg)} op names")
        for cat, dur in cats.most_common():
            print(f"   {dur/1e6:10.3f} ms {100.0*dur/max(total,1):5.1f}%"
                  f"  {cat}")
    # by output-shape attribution: 'bf16[2,512,512,256]' style keys let
    # HBM-bound elementwise mass be pinned to specific activations
    shape_re = re.compile(r"=\s*\(?((?:bf16|f32|f16|s32|u32|pred)\[[^\]]*\])")
    by_shape = collections.Counter()
    for line_name, agg0 in by_line.items():
        if line_name != "XLA Ops":
            continue
        for name, dur in agg0.items():
            m = shape_re.search(name)
            by_shape[m.group(1) if m else "?"] += dur
    print("\nby output shape (XLA Ops):")
    for shp, dur in by_shape.most_common(20):
        print(f"{dur/1e6:10.3f} ms  {shp}")
    ops_line = None
    for line_name in by_line:
        if line_name == "XLA Ops":
            ops_line = line_name
    if ops_line is None:
        for line_name in by_line:
            if "op" in line_name.lower():
                ops_line = line_name
    agg = by_line[ops_line] if ops_line else collections.Counter()
    total = sum(agg.values())
    print(f"\ntop ops ({ops_line}):")
    for name, dur in agg.most_common(top):
        print(f"{dur/1e6:10.3f} ms  {100.0*dur/max(total,1):5.1f}%"
              f"  {name[:140]}")
    dump = os.environ.get("PROFILE_OPS_DUMP")
    if dump:
        import json

        with open(dump, "w") as f:
            json.dump(
                {k: v / 1e6 for k, v in agg.most_common()}, f
            )
        print(f"full op aggregation -> {dump}")
    return {k: v / 1e6 for k, v in agg.items()}


if __name__ == "__main__":
    import jax
    import jax.numpy as jnp

    x = jnp.zeros((1024, 1024), jnp.bfloat16)
    f = jax.jit(lambda a: a @ a)
    profile_fn(lambda: jax.block_until_ready(f(x)))
