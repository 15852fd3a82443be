"""Child process for tests/test_multiprocess.py: one rank of a
2-process coordinator-wired CPU run of the real training CLI.

Usage: python tests/mp_child.py <rank> <port> <outdir>

The parent sets JAX_PLATFORMS/XLA_FLAGS (4 virtual CPU devices per
process) and the torchrun-style env (MASTER_ADDR/MASTER_PORT/WORLD_SIZE/
RANK) that ``init_distributed_singlenode`` consumes — the exact contract
the reference exercises via torchrun (reference distributed.py:27-61).
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

from ml_mdm_tpu import reader  # noqa: E402
from ml_mdm_tpu.clis import train_parallel  # noqa: E402
from ml_mdm_tpu.config import get_arguments  # noqa: E402

logging.basicConfig(level=logging.INFO)


def main():
    args = get_arguments(
        args=[
            "--config_path", os.path.join(HERE, "test_files",
                                          "tiny_train.yaml"),
            "--file-list", os.path.join(HERE, "test_files",
                                        "sample_training_0.tsv"),
            "--output-dir", outdir,
            "--save-freq", "1",
            "--batch-size", "4",
            "--num-training-steps", "2",
            "--multinode", "1",
        ],
        mode="trainer",
    )
    # deterministic single-thread reader so the parent test can replay
    # each partition's exact row stream
    args.reader_config.num_readers = 1
    np.random.seed(args.seed)

    # record which reader partition this process asked for
    record = {"rank": rank}
    orig = reader.get_dataset_partition

    def spy(partition_num, num_partitions, *a, **kw):
        record["partition_num"] = int(partition_num)
        record["num_partitions"] = int(num_partitions)
        return orig(partition_num, num_partitions, *a, **kw)

    reader.get_dataset_partition = spy

    # record each consumed batch's caption digest (the parent compares
    # partitions between ranks and against its own replay)
    digests = []
    orig_load = train_parallel.load_batch

    def load_spy(next_sample, language_model, tokenizer):
        s = orig_load(next_sample, language_model, tokenizer)
        digests.append([str(c) for c in s.get("caption", [])])
        return s

    train_parallel.load_batch = load_spy

    # record per-step losses as rank 0's logger sees them
    losses = []
    from ml_mdm_tpu.utils import simple_logger

    orig_scalar = simple_logger.Logger.add_scalar

    def scalar_spy(self, name, value):
        if name == "loss":
            losses.append(float(value))
        return orig_scalar(self, name, value)

    simple_logger.Logger.add_scalar = scalar_spy

    os.chdir(REPO)  # vocab path in the YAML is repo-relative
    state = train_parallel.main(args)

    record["digests"] = digests
    record["losses"] = losses
    record["device_count"] = jax.device_count()
    record["process_count"] = jax.process_count()
    record["final_step"] = int(state.step)
    # replicated global params: every process can read its local replica
    leaves = jax.tree_util.tree_leaves(jax.device_get(state.params))
    record["param_l2"] = float(
        np.sqrt(sum(float((np.asarray(x) ** 2).sum()) for x in leaves))
    )
    with open(os.path.join(outdir, f"record_{rank}.json"), "w") as f:
        json.dump(record, f)
    print(f"mp_child rank {rank} done", flush=True)


if __name__ == "__main__":
    main()
