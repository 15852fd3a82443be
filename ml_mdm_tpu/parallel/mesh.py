"""Device mesh + sharding helpers.

The reference scales with torch DDP over NCCL (distributed.py, DDP wrap in
train_parallel.py:147-154). TPU-native equivalent: one jit-compiled train
step over a ``jax.sharding.Mesh``; the batch is sharded over the ``data``
axis, parameters are replicated (pure DP parity) or sharded over an
optional ``fsdp`` axis (idiomatic extension); XLA inserts the gradient
all-reduce / all-gather collectives over ICI automatically.

Mesh spec strings: ``"data:8"``, ``"data:4,fsdp:2"``; None = all visible
devices on the data axis.
"""
from __future__ import annotations

import math
from typing import Any, Dict, Optional

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def create_mesh(spec: Optional[str] = None, devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if not spec:
        return Mesh(np.asarray(devices), axis_names=("data",))
    axes = []
    sizes = []
    for part in spec.split(","):
        name, _, size = part.partition(":")
        axes.append(name.strip())
        sizes.append(int(size) if size else -1)
    # one axis may be -1 (inferred)
    known = math.prod(s for s in sizes if s > 0)
    sizes = [s if s > 0 else n // known for s in sizes]
    assert math.prod(sizes) == n, f"mesh {spec} != {n} devices"
    dev_array = np.asarray(devices).reshape(sizes)
    return Mesh(dev_array, axis_names=tuple(axes))


def create_data_mesh_for_batch(batch_size: int, spec: Optional[str] = None,
                               devices=None) -> Mesh:
    """Mesh whose data axis divides ``batch_size`` (the GLOBAL batch):
    uses the largest divisor of batch_size <= device count when no
    explicit spec given. In a multi-process (multi-host) run every
    process must drive the same device set, so the mesh always spans all
    devices there — the global batch must divide the device count."""
    if spec:
        return create_mesh(spec, devices)
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if jax.process_count() > 1:
        assert batch_size % n == 0, (
            f"multi-process run: global batch {batch_size} must divide "
            f"the {n}-device mesh (every process drives all devices)"
        )
        return Mesh(np.asarray(devices), axis_names=("data",))
    while n > 1 and batch_size % n != 0:
        n -= 1
    return Mesh(np.asarray(devices[:n]), axis_names=("data",))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) dim over the data axis."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch: Dict[str, Any], mesh: Mesh) -> Dict[str, Any]:
    """Device-put host arrays with batch-dim sharding over `data`."""
    sh = batch_sharding(mesh)
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, sh) if hasattr(x, "shape") and x.ndim > 0
        else x,
        batch,
    )


def put_global_batch(batch: Dict[str, Any], mesh: Mesh) -> Dict[str, Any]:
    """Assemble the GLOBAL data-sharded batch from per-process local
    arrays. In a single-process run this is plain sharded device_put; in
    a multi-process run each process contributes its own reader
    partition's rows and the global array concatenates them in process
    order (process p's rows land on p's mesh devices) — the torchrun-DDP
    "per-rank batch" contract (reference train_parallel.py:171-178),
    expressed as one global jit argument instead of an NCCL all-reduce.
    """
    if jax.process_count() == 1:
        return shard_batch(batch, mesh)
    sh = batch_sharding(mesh)
    return jax.tree_util.tree_map(
        lambda x: jax.make_array_from_process_local_data(sh, np.asarray(x))
        if hasattr(x, "shape") and x.ndim > 0 else x,
        batch,
    )


def infer_param_sharding(
    params, mesh: Mesh, axis: str = "fsdp", min_size: int = 2**16
):
    """FSDP-style sharding: split each large parameter's largest divisible
    dimension across ``axis``; small params stay replicated."""
    if axis not in mesh.axis_names:
        return jax.tree_util.tree_map(lambda _: replicated(mesh), params)
    n = mesh.shape[axis]

    def spec_for(p):
        if p.size < min_size:
            return NamedSharding(mesh, P())
        dims = sorted(
            range(p.ndim), key=lambda d: p.shape[d], reverse=True
        )
        for d in dims:
            if p.shape[d] % n == 0:
                parts = [None] * p.ndim
                parts[d] = axis
                return NamedSharding(mesh, P(*parts))
        return NamedSharding(mesh, P())

    return jax.tree_util.tree_map(spec_for, params)


def make_data_parallel_sampler(pipeline, batch: int, image_side: int,
                               mesh: Optional[Mesh] = None, **kwargs):
    """Returns run(params, sample, key) -> images: one jitted denoise
    scan with the batch (noise, conditioning, outputs) sharded over the
    mesh's ``data`` axis and parameters replicated — the serving-scale
    fan-out path. The jit is cached on the returned closure; call it
    per request. Numerically identical to single-device sampling with
    the same key (no cross-example reductions exist in the sampler).

    ``sample`` rows (lm_outputs/lm_mask) may be 2x batch for CFG; any
    leading dim divisible by the data axis shards cleanly.
    """
    if mesh is None:
        mesh = create_data_mesh_for_batch(batch)
    rep = replicated(mesh)

    jfn = jax.jit(
        lambda p, s, k: pipeline.sample(
            p, batch, s, image_side, k, **kwargs
        ),
    )

    def run(params, sample, key):
        # sharding propagates from the committed inputs
        params = jax.device_put(params, rep)
        sample = shard_batch(sample, mesh)
        return jfn(params, sample, key)

    return run


def sample_data_parallel(pipeline, params, batch: int, sample,
                         image_side: int, key, mesh: Optional[Mesh] = None,
                         **kwargs):
    """One-shot convenience wrapper over make_data_parallel_sampler."""
    run = make_data_parallel_sampler(
        pipeline, batch, image_side, mesh=mesh, **kwargs
    )
    return run(params, sample, key)
