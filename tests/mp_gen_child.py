"""Child process for tests/test_multiprocess_generate.py: one rank of a
2-process coordinator-wired CPU run of the eval-generation CLI.

Usage: python tests/mp_gen_child.py <rank> <port> <outdir>

Mirrors the reference's torchrun'd generate_batch (reference
generate_batch.py:104-107 partitions the eval set by global rank and
:171-176 writes per-rank manifests); the parent test asserts disjoint
shards and chains both manifests into the FID CLI.
"""
import json
import logging
import os
import sys

rank = int(sys.argv[1])
port = sys.argv[2]
outdir = sys.argv[3]

# jax must see these before first import
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
os.environ["MASTER_ADDR"] = "localhost"
os.environ["MASTER_PORT"] = port
os.environ["WORLD_SIZE"] = "2"
os.environ["RANK"] = str(rank)

import numpy as np  # noqa: E402

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)
sys.path.insert(0, REPO)

from ml_mdm_tpu.clis import generate_batch  # noqa: E402
from ml_mdm_tpu.config import get_arguments  # noqa: E402

logging.basicConfig(level=logging.INFO)


def main():
    args = get_arguments(
        args=[
            "--config_path", os.path.join(HERE, "test_files",
                                          "tiny_train.yaml"),
            "--test-file-list", os.path.join(HERE, "test_files",
                                             "sample_training_0.tsv"),
            "--sample-dir", outdir,
            "--min-examples", "8",
            "--seed", "11",
        ],
        mode="sampler",
    )
    args.reader_config.num_readers = 1
    np.random.seed(args.seed)
    os.chdir(REPO)  # vocab path in the YAML is repo-relative
    n = generate_batch.main(
        args,
        negative_prompt="low quality",
        guidance_scale=2.0,
        num_inference_steps=4,
        ddim_eta=0.0,
    )
    with open(os.path.join(outdir, f"gen_record_{rank}.json"), "w") as f:
        json.dump(
            {
                "rank": rank,
                "n": int(n),
                "process_count": jax.process_count(),
                "process_index": jax.process_index(),
            },
            f,
        )
    print(f"mp_gen_child rank {rank} done", flush=True)


if __name__ == "__main__":
    main()
