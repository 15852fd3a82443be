"""Distributed eval-sample generation CLI (reference generate_batch.py).

Each process reads its reader partition until min_examples/world_size
samples are cached, saves reference PNGs + ``rank{r}/lst.json`` caption
manifests + an HTML gallery, then denoises batches with CFG (negative
prompt spliced as the uncond rows) and writes sample PNGs. The metrics CLI
(run_torchmetrics) polls the per-rank lst.json files downstream.
"""
from __future__ import annotations

import json
import logging
import os
import time

import numpy as np

import jax
import jax.numpy as jnp

from ml_mdm_tpu import generate_html, helpers, reader
from ml_mdm_tpu.config import get_arguments, get_model, get_pipeline
from ml_mdm_tpu.distributed import barrier, init_distributed_singlenode
from ml_mdm_tpu.language_models import factory
from ml_mdm_tpu.reader import convert, process_text
from ml_mdm_tpu.utils import checkpoint as ckpt


def save_png(arr_m1_1: np.ndarray, path: str):
    """[-1,1] float NHWC -> PNG (de-normalization x*128+127,
    generate_batch.py:205)."""
    from PIL import Image

    img = np.clip(
        np.asarray(arr_m1_1, dtype=np.float32) * 128.0 + 127.0, 0, 255
    ).astype(np.uint8)
    Image.fromarray(img).save(path)


def generate_data(
    args, tokenizer, language_model, num_examples: int, negative_prompt=None
):
    """Cache (tokens, captions, reference images, lm features) from the
    eval partition (reference generate_batch.py:26-78)."""
    rank, world = jax.process_index(), max(jax.process_count(), 1)
    loader = reader.get_dataset_partition(
        rank,
        world,
        tokenizer,
        args.batch_size,
        args.test_file_list,
        args.reader_config,
        num_epochs=1,
        is_index_file=True,
    )
    cached = []
    total = 0
    for sample in loader:
        captions = [convert(c) for c in sample["caption"]]
        if negative_prompt is not None:
            neg_tokens = process_text(
                [negative_prompt] * len(captions), tokenizer,
                args.reader_config,
            )
            pos_tokens = [list(t) for t in sample["tokens"]]
            max_len = max(
                max(len(t) for t in neg_tokens),
                max(len(t) for t in pos_tokens),
            )
            pad = tokenizer.token_id(args.reader_config.padding_token)

            def pad_to(ts):
                return np.asarray(
                    [t + [pad] * (max_len - len(t)) for t in ts],
                    dtype=np.int64,
                )

            tokens = np.concatenate(
                [pad_to(neg_tokens), pad_to(pos_tokens)], axis=0
            )
        else:
            tokens = sample["tokens"]
        lm_outputs, lm_mask = language_model(
            {"tokens": tokens}, tokenizer
        )
        cached.append(
            {
                "captions": captions,
                "tokens": tokens,
                "lm_outputs": np.asarray(lm_outputs),
                "lm_mask": np.asarray(lm_mask),
                "image": sample.get("image"),
            }
        )
        total += len(captions)
        if total >= num_examples:
            break
    if hasattr(loader, "close"):
        loader.close()
    return cached


def main(args, negative_prompt=None, guidance_scale=1.0, ddim_eta=None,
         num_inference_steps=None, chunk_steps=None):
    local_rank, global_rank, world_size = init_distributed_singlenode()
    tokenizer, language_model = factory.create_lm(args)
    lm_dim = language_model.embed_dim
    args.unet_config.conditioning_feature_dim = lm_dim
    vision_module = get_model(args.model)(3, 3, args.unet_config)
    pipeline = get_pipeline(args.model)(vision_module, args.diffusion_config)

    sample_dir = args.sample_dir
    rank_dir = os.path.join(sample_dir, f"rank{global_rank}")
    os.makedirs(rank_dir, exist_ok=True)

    num_examples = max(args.min_examples // max(world_size, 1), 1)
    use_cfg = guidance_scale != 1.0
    cached = generate_data(
        args, tokenizer, language_model, num_examples,
        negative_prompt if use_cfg else None,
    )

    # save reference images + manifest + gallery
    caption_lst = []
    idx = 0
    for batch in cached:
        for i, cap in enumerate(batch["captions"]):
            if batch["image"] is not None:
                fname = os.path.join(rank_dir, f"ref_{idx:06d}.png")
                save_png(
                    (batch["image"][i].astype(np.float32) - 127.0) / 128.0,
                    fname,
                )
                caption_lst.append((fname, cap))
            idx += 1
    with open(os.path.join(rank_dir, "lst.json"), "w") as f:
        json.dump({f"s_{i:06d}.png": c for i, (_, c) in
                   enumerate(caption_lst)}, f)
    if global_rank == 0:
        generate_html.create_html(
            os.path.join(sample_dir, "index.html"),
            len(caption_lst),
            caption_lst,
        )

    # load checkpoint
    image_side = (
        args.sample_image_size
        if args.sample_image_size > 0
        else (args.reader_config.image_size or 64)
    )
    key = jax.random.PRNGKey(max(args.seed, 0))
    key, k_init = jax.random.split(key)
    params = pipeline.init_params(
        k_init, image_side=image_side, lm_dim=max(lm_dim, 8)
    )
    barrier("pre-load")
    if args.model_file:
        params, _ = ckpt.load_vision_model(args.model_file, params)
    barrier("post-load")

    sample_kwargs = {}
    if num_inference_steps:
        sample_kwargs = dict(
            num_inference_steps=num_inference_steps, resample_steps=True
        )
    if ddim_eta is not None:
        sample_kwargs["ddim_eta"] = ddim_eta

    # jit per batch size (the last batch may be ragged), with params as an
    # explicit argument — closing over them would bake the weights into
    # the HLO as literal constants
    jit_cache = {}

    def sample_jit(b):
        if chunk_steps:
            # bounded-duration device chunks (long fused scans can trip
            # RPC deadlines on tunneled TPU runtimes); jits internally
            # with params as arguments and caches on the sampler
            def g(p, lm, mask, k):
                s = {"lm_outputs": lm, "lm_mask": mask}
                return pipeline.sample_chunked(
                    p, b, s, image_side, k,
                    guidance_scale=guidance_scale,
                    chunk_steps=chunk_steps, **sample_kwargs,
                )

            return g
        if b not in jit_cache:
            n_dev = len(jax.devices())
            if n_dev > 1 and b % n_dev == 0:
                # local multi-device fan-out: batch sharded over the
                # data mesh, params replicated (parallel/mesh.py)
                from ml_mdm_tpu import parallel

                run = parallel.make_data_parallel_sampler(
                    pipeline, b, image_side,
                    guidance_scale=guidance_scale, **sample_kwargs,
                )

                def f(p, lm, mask, k, _run=run):
                    s = {"lm_outputs": lm, "lm_mask": mask}
                    return _run(p, s, k)

                jit_cache[b] = f
            else:
                def f(p, lm, mask, k):
                    s = {"lm_outputs": lm, "lm_mask": mask}
                    return pipeline.sample(
                        p, b, s, image_side, k,
                        guidance_scale=guidance_scale, **sample_kwargs,
                    )

                jit_cache[b] = jax.jit(f)
        return jit_cache[b]

    out_idx = 0
    manifest = {}
    for batch in cached:
        b = len(batch["captions"])
        key, k_s = jax.random.split(key)
        out = sample_jit(b)(
            params,
            jnp.asarray(batch["lm_outputs"]),
            jnp.asarray(batch["lm_mask"]),
            k_s,
        )
        out = np.asarray(jnp.clip(out, -1, 1))
        for i, cap in enumerate(batch["captions"]):
            fname = f"s_{out_idx:06d}.png"
            save_png(out[i], os.path.join(rank_dir, fname))
            manifest[fname] = cap
            out_idx += 1
    with open(os.path.join(rank_dir, "lst.json"), "w") as f:
        json.dump(manifest, f)
    logging.info(f"rank {global_rank}: wrote {out_idx} samples")
    return out_idx


if __name__ == "__main__":
    args = get_arguments(mode="sampler")
    logging.basicConfig(
        format=(
            "%(asctime)s,%(msecs)d %(levelname)-8s "
            "[%(filename)s:%(lineno)d] %(message)s"
        ),
        datefmt="%Y-%m-%d:%H:%M:%S",
        level=getattr(logging, args.loglevel.upper(), None),
    )
    seed = args.seed if args.seed != -1 else int(time.time() % 10000)
    np.random.seed(seed)
    args.seed = seed
    helpers.select_platform(args)
    helpers.print_args(args)
    main(args)
