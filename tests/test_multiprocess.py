"""Multi-HOST (multi-process) correctness: 2 coordinator-wired CPU
processes with 4 virtual devices each run the real training CLI
end-to-end (jax.distributed.initialize path, --multinode partitioning,
rank-0-gated barrier'd saves) and must produce exactly the loss of a
single-process 8-device run over the same global batches.

This is the surface the reference exercises via torchrun (reference
distributed.py:27-61, train_parallel.py:171-178) that single-process
mesh tests cannot reach: process-local reader partitions assembled into
one global jit argument (parallel/mesh.py:put_global_batch).
"""
import json
import os
import subprocess
import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)
YAML = os.path.join(HERE, "test_files", "tiny_train.yaml")
INDEX = os.path.join(HERE, "test_files", "sample_training_0.tsv")


@pytest.fixture(scope="module")
def mp_run(tmp_path_factory):
    """Launch the 2-process run once; tests assert on its artifacts."""
    out = tmp_path_factory.mktemp("mp_out")
    port = "8917"
    env_base = {
        k: v for k, v in os.environ.items()
        if k not in ("JAX_PLATFORMS", "XLA_FLAGS", "MASTER_ADDR",
                     "MASTER_PORT", "WORLD_SIZE", "RANK")
    }
    procs = []
    for rank in range(2):
        procs.append(subprocess.Popen(
            [sys.executable, os.path.join(HERE, "mp_child.py"),
             str(rank), port, str(out)],
            env=env_base, cwd=REPO,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        ))
    logs = []
    for p in procs:
        try:
            stdout, _ = p.communicate(timeout=600)
        except subprocess.TimeoutExpired:
            p.kill()
            stdout, _ = p.communicate()
        logs.append(stdout)
    for rank, (p, log) in enumerate(zip(procs, logs)):
        assert p.returncode == 0, f"rank {rank} failed:\n{log[-4000:]}"
    records = []
    for rank in range(2):
        with open(os.path.join(str(out), f"record_{rank}.json")) as f:
            records.append(json.load(f))
    return out, logs, records


@pytest.mark.slow
def test_global_mesh_spans_both_processes(mp_run):
    _, _, records = mp_run
    for r in records:
        assert r["device_count"] == 8
        assert r["process_count"] == 2
        assert r["final_step"] == 2


@pytest.mark.slow
def test_reader_partitions_differ(mp_run):
    _, _, records = mp_run
    assert records[0]["partition_num"] == 0
    assert records[1]["partition_num"] == 1
    assert records[0]["num_partitions"] == 2
    assert records[1]["num_partitions"] == 2
    # the two processes consumed disjoint caption streams
    flat0 = [c for b in records[0]["digests"] for c in b]
    flat1 = [c for b in records[1]["digests"] for c in b]
    assert flat0 and flat1
    assert flat0 != flat1


@pytest.mark.slow
def test_saves_rank0_gated(mp_run):
    out, logs, _ = mp_run
    files = os.listdir(str(out))
    assert "vis_model_000002.pth" in files
    assert any(f.startswith("train_state_") for f in files)
    assert "Saving model" not in logs[1]  # rank 1 never writes


@pytest.mark.slow
def test_params_replicated_identically(mp_run):
    _, _, records = mp_run
    assert records[0]["param_l2"] == pytest.approx(
        records[1]["param_l2"], rel=0, abs=0
    )


@pytest.mark.slow
def test_loss_matches_single_process_run(mp_run):
    """Replay the exact global batches (partition 0 rows then partition
    1 rows, the process order put_global_batch assembles) on this
    process's 8 virtual devices; per-step losses must match the
    2-process run bit-for-bit (CPU f32, same PRNG keys)."""
    from ml_mdm_tpu import reader, trainer
    from ml_mdm_tpu.clis.train_parallel import _device_batch, load_batch
    from ml_mdm_tpu.config import get_arguments, get_model, get_pipeline
    from ml_mdm_tpu.language_models import factory
    from ml_mdm_tpu.parallel import (
        batch_sharding, create_data_mesh_for_batch, replicated,
    )

    out, _, records = mp_run
    args = get_arguments(
        args=[
            "--config_path", YAML,
            "--file-list", INDEX,
            "--batch-size", "4",
            "--num-training-steps", "2",
        ],
        mode="trainer",
    )
    args.reader_config.num_readers = 1
    # main() forces this in the 2-process run (static global shapes)
    args.reader_config.pad_to_max_length = True
    os.chdir(REPO)
    np.random.seed(args.seed)

    tokenizer, language_model = factory.create_lm(args)
    lm_dim = language_model.embed_dim
    args.unet_config.conditioning_feature_dim = lm_dim
    module = get_model(args.model)(3, 3, args.unet_config)
    pipeline = get_pipeline(args.model)(module, args.diffusion_config)

    key = jax.random.PRNGKey(max(args.seed, 0))
    key, k_init = jax.random.split(key)
    params = pipeline.init_params(
        k_init, image_side=args.reader_config.image_size,
        lm_dim=max(lm_dim, 8),
    )
    tcfg = trainer.TrainerConfig(
        lr=args.lr, warmup_steps=args.warmup_steps,
        gradient_clip_norm=args.gradient_clip_norm,
    )
    optimizer, _ = trainer.make_optimizer(tcfg)
    state = trainer.TrainState.create(params, optimizer)
    mesh = create_data_mesh_for_batch(8)
    state = jax.device_put(state, replicated(mesh))
    bsh = batch_sharding(mesh)
    step_fn = jax.jit(
        trainer.make_train_step(pipeline, optimizer, tcfg,
                                compute_dtype=jnp.float32),
        donate_argnums=(0,),
    )

    loaders = [
        reader.get_dataset_partition(
            p, 2, tokenizer, 4, INDEX, args.reader_config,
            args.num_epochs, load_numpy=False, is_index_file=True,
        )
        for p in range(2)
    ]
    iters = [iter(ld) for ld in loaders]
    losses = []
    for _step in range(2):
        parts = [
            load_batch(next(it), language_model, tokenizer)
            for it in iters
        ]
        parts = [_device_batch(s, pipeline) for s in parts]
        batch = {
            k: jnp.concatenate([parts[0][k], parts[1][k]], axis=0)
            for k in parts[0]
        }
        batch = jax.device_put(batch, bsh)
        key, k_step = jax.random.split(key)
        state, metrics = step_fn(state, batch, k_step)
        losses.append(float(metrics["loss"]))
    for ld in loaders:
        if hasattr(ld, "close"):
            ld.close()

    mp_losses = records[0]["losses"]
    assert len(mp_losses) == 2
    np.testing.assert_allclose(mp_losses, losses, rtol=0, atol=1e-6)
