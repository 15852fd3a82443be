"""Offline sample-quality gate — the hermetic stand-in for the
network-gated flickr FID validation (tools/run_flickr_fid.sh; reference
protocol ml-mdm-matryoshka/ml_mdm/clis/run_torchmetrics.py:85-171).

Nothing else in the suite would catch a quality-destroying numerics bug
that preserves shapes and finiteness. This does: overfit the tiny
pipeline on the 10 hermetic fixture images for 500 steps, generate two
seed-disjoint sample sets conditioned on the SAME captions, and assert
each sample lands near ITS reference image. Calibration (CPU, this
fixture): untrained-model samples score MSE ~0.50; after 500 steps
~0.013 — a 38x gap, gated at 0.05 with 10x margin to the broken
anchor. Pixel-FID (the run_torchmetrics extractor) is also computed and
must improve, but with only 10 references the Frechet statistics are
rank-deficient, so the pinned gate rides the per-caption MSE.
"""
import io
import os
import tarfile

import numpy as np
import pytest

import jax
import jax.numpy as jnp

PIL = pytest.importorskip("PIL")
from PIL import Image  # noqa: E402

HERE = os.path.dirname(__file__)
REPO = os.path.dirname(HERE)


@pytest.mark.slow
def test_trained_samples_match_references():
    from ml_mdm_tpu import reader, trainer
    from ml_mdm_tpu.config import get_arguments, get_model, get_pipeline
    from ml_mdm_tpu.language_models import factory

    os.chdir(REPO)
    args = get_arguments(
        args=["--config_path", "tests/test_files/tiny_train.yaml"],
        mode="trainer",
    )
    tokenizer, lm = factory.create_lm(args)

    caps = {}
    with open("tests/test_files/images_00000.tsv") as f:
        next(f)
        for line in f:
            _tar, fn, cap = line.strip().split("\t")
            caps[fn] = cap
    refs, texts = [], []
    with tarfile.open("tests/test_files/images_00000.tar") as t:
        for m in t.getmembers():
            img = Image.open(io.BytesIO(t.extractfile(m).read()))
            refs.append(np.asarray(
                img.convert("RGB").resize((16, 16), Image.BILINEAR)
            ))
            texts.append(caps[m.name])
    refs = np.asarray(refs)
    images = refs.astype(np.float32) / 127.5 - 1.0

    tok = reader.process_text(texts, tokenizer, args.reader_config)
    lm_outputs, lm_mask = lm({"tokens": np.asarray(tok)}, tokenizer)

    pipeline = get_pipeline(args.model)(
        get_model(args.model)(3, 3, args.unet_config),
        args.diffusion_config,
    )
    params = pipeline.init_params(
        jax.random.PRNGKey(0), image_side=16,
        lm_dim=lm_outputs.shape[-1], seq_len=lm_outputs.shape[1],
    )
    tcfg = trainer.TrainerConfig(
        lr=5e-4, warmup_steps=20, gradient_clip_norm=2.0, ema_decay=0.99
    )
    opt, _ = trainer.make_optimizer(tcfg)
    state = trainer.TrainState.create(params, opt)
    step = jax.jit(
        trainer.make_train_step(pipeline, opt, tcfg), donate_argnums=(0,)
    )
    batch = {
        "images": jnp.asarray(images),
        "lm_outputs": jnp.asarray(lm_outputs),
        "lm_mask": jnp.asarray(lm_mask),
    }

    def probe(p):
        """Mean per-caption MSE of 2 seed-disjoint sample sets, plus
        pixel-FID features for the protocol-shaped secondary check."""
        from ml_mdm_tpu.clis.run_torchmetrics import (
            PixelFeatures, fid_from_features,
        )

        mses, u8s = [], []
        s = {
            "lm_outputs": jnp.asarray(lm_outputs),
            "lm_mask": jnp.asarray(lm_mask),
        }
        for seed in (0, 1):
            img = np.asarray(pipeline.sample(
                p, len(texts), s, 16, jax.random.PRNGKey(seed),
                num_inference_steps=20, resample_steps=True, ddim_eta=0.0,
            ))
            mses.append(((img - images) ** 2).mean(axis=(1, 2, 3)))
            u8s.append(
                np.clip((img + 1) * 127.5, 0, 255).astype(np.uint8)
            )
        px = PixelFeatures()
        fid = fid_from_features(px(np.concatenate(u8s)), px(refs))
        return float(np.mean(mses)), fid

    mse_untrained, fid_untrained = probe(params)
    # broken-anchor sanity: an untrained model's samples are far from
    # the references; if THIS fails the probe itself is miscalibrated
    assert mse_untrained > 0.3, mse_untrained

    for i in range(500):
        state, m = step(state, batch, jax.random.PRNGKey(100 + i))
    assert np.isfinite(float(m["loss"]))

    mse_trained, fid_trained = probe(state.ema_params)
    # calibrated: 0.013 measured; 0.05 leaves ~4x headroom while still
    # sitting 10x below the untrained anchor (~0.50)
    assert mse_trained < 0.05, (mse_trained, mse_untrained)
    assert fid_trained < fid_untrained, (fid_trained, fid_untrained)
