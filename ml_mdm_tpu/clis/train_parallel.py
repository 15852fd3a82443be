"""Training CLI — TPU-native counterpart of the reference torchrun trainer
(/root/reference/ml-mdm-matryoshka/ml_mdm/clis/train_parallel.py).

    python -m ml_mdm_tpu.clis.train_parallel \\
        --config_path configs/models/cc12m_64x64.yaml --file-list train.tsv

Differences from the reference, by design:
- one jit-compiled train step over a jax.sharding.Mesh replaces the
  DDP/NCCL wrap; gradients all-reduce over ICI via sharding constraints;
- EMA, NaN-skip, grad clipping and the optimizer all run inside the
  compiled step (no host round-trips in the hot loop);
- bf16 compute with fp32 params replaces fp16+GradScaler;
- checkpoints are written both as Orbax (full train state, exact resume)
  and as reference-compatible .pth (EMA + raw), so the reference tooling
  can read them back.
"""
from __future__ import annotations

import logging
import os
import time

import numpy as np

import jax
import jax.numpy as jnp

from ml_mdm_tpu import helpers, reader, trainer
from ml_mdm_tpu.config import get_arguments, get_model, get_model_config_cls, get_pipeline
from ml_mdm_tpu.distributed import barrier, init_distributed_singlenode
from ml_mdm_tpu.language_models import factory
from ml_mdm_tpu.parallel import batch_sharding, replicated
from ml_mdm_tpu.reader import convert
from ml_mdm_tpu.trainer import RobustLossTracker, TrainerConfig, TrainState
from ml_mdm_tpu.utils import checkpoint as ckpt
from ml_mdm_tpu.utils import simple_logger


def load_batch(next_sample, language_model, tokenizer):
    """Host-side batch prep: normalize images (NHWC stays native), run the
    frozen LM, build micro-conditioning scalars."""
    sample = dict(next_sample)
    if "image" in sample:
        images = (sample["image"].astype(np.float32) - 127.0) / 128.0
        sample["images"] = images  # already NHWC
    if "watermark_score" in sample:
        sample["watermark_score"] = np.asarray(
            [float(convert(w)) for w in sample["watermark_score"]],
            dtype=np.float32,
        )
    if "state" in sample and "image" in sample:
        sample["scale"] = (
            float(sample["image"].shape[1]) / sample["state"][:, 0]
        )
    lm_outputs, lm_mask = language_model(sample, tokenizer)
    sample["lm_outputs"] = np.asarray(lm_outputs)
    sample["lm_mask"] = np.asarray(lm_mask)
    return sample


def _device_batch(sample, pipeline):
    keep = {"images", "lm_outputs", "lm_mask"}
    conds = pipeline.vision_module.conditions or {}
    keep |= set(conds)
    return {k: jnp.asarray(v) for k, v in sample.items() if k in keep}


def main(args):
    local_rank, global_rank, world_size = init_distributed_singlenode(
        timeout=36000
    )
    input_channels = 3

    if jax.process_count() > 1 and not args.reader_config.pad_to_max_length:
        # every process contributes rows of ONE global array: token
        # shapes must agree across processes (and static shapes avoid
        # per-length recompiles of the train step)
        assert args.reader_config.max_token_length != -1, (
            "multi-process training needs a static max_token_length"
        )
        args.reader_config.pad_to_max_length = True
        logging.info(
            "multi-process run: forcing reader pad_to_max_length so all "
            "processes produce identically-shaped batches"
        )

    tokenizer, language_model = factory.create_lm(args)
    lm_dim = language_model.embed_dim

    args.unet_config.conditioning_feature_dim = lm_dim
    vision_module = get_model(args.model)(
        input_channels,
        input_channels,
        args.unet_config,
        dtype=jnp.bfloat16 if args.fp16 else jnp.float32,
    )
    pipeline = get_pipeline(args.model)(vision_module, args.diffusion_config)

    if global_rank == 0 and args.output_dir:
        os.makedirs(args.output_dir, exist_ok=True)
    barrier("setup")

    # ---- params init / resume
    image_side = args.reader_config.image_size
    if image_side <= 0:
        image_side = 64
    key = jax.random.PRNGKey(max(args.seed, 0))
    key, k_init = jax.random.split(key)
    params = pipeline.init_params(
        k_init, image_side=image_side, lm_dim=max(lm_dim, 8)
    )
    n_params = sum(p.size for p in jax.tree_util.tree_leaves(params))
    logging.info(f"Model parameters: {n_params/1e6:.2f}M")

    # Matryoshka progressive recipe: warm-start inner-UNet subtrees from
    # pretrained checkpoints (reference nested_unet.py:147-152) BEFORE
    # the EMA copy is made, so both start from the loaded weights.
    if hasattr(args.unet_config, "inner_config"):
        params = ckpt.apply_inner_warm_start(params, args.unet_config)

    tracker = RobustLossTracker()
    start_batch_num = 0
    other_items = None
    if args.pretrained_vision_file:
        resume_path = ckpt.select_resume_checkpoint(
            args.pretrained_vision_file,
            bool(getattr(args, "resume_from_ema", False)),
        )
        if os.path.exists(resume_path):
            logging.info(f"Loading ckpt from {resume_path}")
            params, other_items = ckpt.load_vision_model(resume_path, params)
    if other_items and "batch_num" in other_items:
        start_batch_num = int(other_items["batch_num"])
        tracker.load(
            float(other_items.get("exp_avg_loss", 0.0)),
            float(other_items.get("exp_avg_loss_var", 0.0)),
            float(other_items.get("best_avg_loss", 1e12)),
        )
        logging.info(f"Loaded model. Batch #: {start_batch_num}")

    logger = None
    if global_rank == 0:
        logger = simple_logger.Logger(
            os.path.join(args.output_dir or ".", "train"), args.log_freq
        )
        try:
            logger.add_tensorboard_logger()
        except Exception as e:  # tensorboard optional
            logging.warning(f"tensorboard unavailable: {e}")

    # ---- optimizer + compiled step
    tcfg = TrainerConfig(
        lr=args.lr,
        warmup_steps=args.warmup_steps,
        gradient_clip_norm=args.gradient_clip_norm,
        use_adamw=args.use_adamw,
        num_gradient_accumulations=args.num_gradient_accumulations,
        loss_factor=args.loss_factor,
        remat=bool(getattr(args, "remat", 0)),
    )
    freeze_mask = None
    if getattr(args.unet_config, "freeze_inner_unet", False):
        freeze_mask = jax.tree_util.tree_map_with_path(
            lambda path, _: "freeze"
            if any(getattr(p, "key", None) == "inner_unet" for p in path)
            else "train",
            params,
        )
    optimizer, lr_schedule = trainer.make_optimizer(tcfg, freeze_mask)
    state = TrainState.create(params, optimizer)
    state = state.replace(step=jnp.asarray(start_batch_num, jnp.int32))
    del params

    resume_dir = getattr(args, "resume_from_train_state", None)
    if resume_dir:
        # exact resume: params + EMA + optimizer state + step from Orbax
        state, other_items = ckpt.load_train_state(resume_dir, state)
        if getattr(args, "resume_from_ema", False):
            # --resume-from-ema: continue training FROM the EMA weights
            logging.info("--resume-from-ema: params <- ema_params")
            state = state.replace(params=state.ema_params)
        start_batch_num = int(state.step)
        if other_items:
            tracker.load(
                float(other_items.get("exp_avg_loss", 0.0)),
                float(other_items.get("exp_avg_loss_var", 0.0)),
                float(other_items.get("best_avg_loss", 1e12)),
            )
        logging.info(f"Exact resume from {resume_dir} @ {start_batch_num}")

    from ml_mdm_tpu.parallel.mesh import (
        create_data_mesh_for_batch,
        put_global_batch,
    )

    # batch_size is PER PROCESS (reference: per-rank, torchrun DDP); the
    # mesh and the jitted step see the global batch
    global_batch_size = (
        args.batch_size
        * args.num_gradient_accumulations
        * jax.process_count()
    )
    mesh = create_data_mesh_for_batch(
        global_batch_size, getattr(args, "mesh_shape", None)
    )
    logging.info(f"mesh: {dict(mesh.shape)}")
    rep = replicated(mesh)
    state = jax.device_put(state, rep)

    train_step = trainer.make_train_step(
        pipeline,
        optimizer,
        tcfg,
        compute_dtype=jnp.bfloat16 if args.fp16 else jnp.float32,
    )
    train_step = jax.jit(train_step, donate_argnums=(0,))

    # ---- data
    if args.multinode:
        partition_id, num_partitions = jax.process_index(), max(
            jax.process_count(), 1
        )
        if num_partitions == 1:
            partition_id = 0
    else:
        partition_id, num_partitions = local_rank, world_size
    train_loader = reader.get_dataset_partition(
        partition_id,
        num_partitions,
        tokenizer,
        args.batch_size * args.num_gradient_accumulations,
        args.file_list,
        args.reader_config,
        args.num_epochs,
        load_numpy=args.use_precomputed_text_embeddings,
        is_index_file=True,
    )
    data_iter = iter(train_loader)

    batch_num = start_batch_num
    total_time = 0.0
    num_time_counts = 0
    # one-step-delayed metrics: float(metrics) blocks until that step
    # finishes on device, so materialise step N-1's scalars only after
    # step N is dispatched — keeps host-side data loading of the next
    # batch overlapped with device compute (jax dispatch is async)
    pending = None
    last_loss = float("nan")

    def consume(entry):
        """Materialise one step's metrics: tracker + logging."""
        nonlocal last_loss
        num, met = entry
        loss_val = float(met["loss"])
        last_loss = loss_val
        if np.isnan(loss_val):
            return
        tracker.update(loss_val)
        if global_rank == 0 and logger is not None:
            logger.batch_num = num
            m = {
                "loss": loss_val,
                "batch_num": num,
                "exp_avg_loss": tracker.exp_avg_loss,
                "step time": total_time / max(num_time_counts, 1),
                "batch time": total_time
                / max(num - start_batch_num, 1),
                "exp_avg_std_loss": float(
                    np.sqrt(tracker.exp_avg_loss_var)
                ),
                "grad_norm": float(met["grad_norm"]),
            }
            for k_, v_ in m.items():
                logger.add_scalar(k_, v_)
            if num % args.log_freq == 0:
                logging.info(f"Batch: {num} - {m}")

    while batch_num < args.num_training_steps:
        try:
            raw = next(data_iter)
        except StopIteration:
            logging.info("data exhausted")
            break
        sample = load_batch(raw, language_model, tokenizer)
        if "images" not in sample:
            continue
        batch = _device_batch(sample, pipeline)
        batch = put_global_batch(batch, mesh)

        start_time = time.time()
        key, k_step = jax.random.split(key)
        state, metrics = train_step(state, batch, k_step)
        batch_num += 1
        if pending is not None:
            consume(pending)
        pending = (batch_num, metrics)
        total_time += time.time() - start_time
        num_time_counts += 1

        if (batch_num % args.save_freq == 0) or (
            batch_num == args.num_training_steps
        ):
            # saving needs this step's stats: drain the pipeline
            consume(pending)
            pending = None
            other = {
                "batch_num": batch_num,
                "loss": last_loss,
                "best_avg_loss": tracker.best_avg_loss,
                "exp_avg_loss": tracker.exp_avg_loss,
                "exp_avg_loss_var": tracker.exp_avg_loss_var,
            }
            out = args.output_dir or "."
            if global_rank == 0:
                logging.info(f"Saving model. Batch = {batch_num}")
                ckpt.save_vision_model(
                    os.path.join(out, f"vis_model_{batch_num:06d}.pth"),
                    jax.device_get(state.ema_params),
                    other_items=other,
                )
                ckpt.save_vision_model(
                    os.path.join(
                        out, f"vis_model_noema_{batch_num:06d}.pth"
                    ),
                    jax.device_get(state.params),
                    other_items=other,
                )
            # Orbax coordinates across processes internally (its save
            # does a sync_global_processes): EVERY process must enter
            # the save, and Orbax's primary host does the writing.
            ckpt.save_train_state(
                os.path.join(out, f"train_state_{batch_num:06d}"),
                jax.device_get(state),
                other_items=other,
                write_meta=global_rank == 0,
            )
            barrier("save")

        if batch_num >= args.num_training_steps:
            break

    if pending is not None:  # drain the delayed-metrics pipeline
        consume(pending)
    if hasattr(train_loader, "close"):
        train_loader.close()
    return state


if __name__ == "__main__":
    args = get_arguments(mode="trainer")
    logging.basicConfig(
        format=(
            "%(asctime)s,%(msecs)d %(levelname)-8s "
            "[%(filename)s:%(lineno)d] %(message)s"
        ),
        datefmt="%Y-%m-%d:%H:%M:%S",
        level=getattr(logging, args.loglevel.upper(), None),
    )
    seed = args.seed if args.seed != -1 else int(time.time() % 10000)
    logging.info(f"Using seed: {seed}")
    np.random.seed(seed)
    args.seed = seed
    helpers.select_platform(args)
    helpers.print_args(args)
    main(args)
