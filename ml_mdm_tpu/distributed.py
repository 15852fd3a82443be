"""Multi-host process coordination (reference distributed.py, TPU-native).

The reference initialises an NCCL process group from torchrun env vars.
On TPU pods, ``jax.distributed.initialize()`` wires all hosts into one
SPMD program; collectives ride ICI/DCN via XLA. Rank-gated I/O maps to
``jax.process_index() == 0``; barriers to
``multihost_utils.sync_global_devices``.
"""
from __future__ import annotations

import logging
import os


def init_distributed_singlenode(timeout: int = 0):
    """Initialise multi-host JAX if a coordinator is configured. Returns
    (local_rank, global_rank, world_size) like the reference."""
    import jax

    coord = os.environ.get("JAX_COORDINATOR_ADDRESS") or os.environ.get(
        "MASTER_ADDR"
    )
    world = int(
        os.environ.get("JAX_NUM_PROCESSES", os.environ.get("WORLD_SIZE", "1"))
    )
    if coord and world > 1:
        rank = int(
            os.environ.get("JAX_PROCESS_ID", os.environ.get("RANK", "0"))
        )
        port = os.environ.get("MASTER_PORT", "8476")
        jax.distributed.initialize(
            coordinator_address=f"{coord}:{port}",
            num_processes=world,
            process_id=rank,
        )
        logging.info(
            f"jax.distributed initialised: process {rank}/{world}"
        )
    local_rank = int(os.environ.get("LOCAL_RANK", "0"))
    return local_rank, get_rank(), get_world_size()


def get_rank() -> int:
    import jax

    return jax.process_index()


def get_local_rank() -> int:
    return int(os.environ.get("LOCAL_RANK", "0"))


def get_world_size() -> int:
    import jax

    return jax.process_count()


def barrier(name: str = "barrier"):
    import jax

    if jax.process_count() > 1:
        from jax.experimental import multihost_utils

        multihost_utils.sync_global_devices(name)


def print0(*args, **kwargs):
    if get_rank() == 0:
        print(*args, **kwargs)
