"""Precomputed-text-embedding reading (the LM-less training mode,
reference factory.py:52-56 + reader.py:107-112) and checkpoint resume
(--pretrained-vision-file picks up batch_num and loss stats)."""
import io
import os
import tarfile

import numpy as np
import pytest

HERE = os.path.dirname(__file__)
REPO = os.path.dirname(HERE)
VOCAB = os.path.join(HERE, "test_files", "tiny_t5.vocab")
YAML = os.path.join(HERE, "test_files", "tiny_train.yaml")
INDEX = os.path.join(HERE, "test_files", "sample_training_0.tsv")
IMG_TSV = os.path.join(HERE, "test_files", "images_00000.tsv")
IMG_TAR = os.path.join(HERE, "test_files", "images_00000.tar")


def _build_embedding_fixture(tmp_path, dim=16):
    """TSV + tar pair carrying .npy text embeddings per sample."""
    rows = []
    with open(IMG_TSV) as f:
        header = f.readline().rstrip("\n").split("\t")
        for line in f:
            rows.append(dict(zip(header, line.rstrip("\n").split("\t"))))
    text_tar = tmp_path / "text_00000.tar"
    rng = np.random.default_rng(0)
    with tarfile.open(text_tar, "w") as tf:
        for i, row in enumerate(rows):
            arr = rng.normal(size=(7, dim)).astype(np.float32)
            buf = io.BytesIO()
            np.save(buf, arr)
            data = buf.getvalue()
            info = tarfile.TarInfo(name=f"emb_{i:04d}.npy")
            info.size = len(data)
            tf.addfile(info, io.BytesIO(data))
    tsv = tmp_path / "images_emb.tsv"
    with open(tsv, "w") as f:
        f.write("tar\tfile\tcaption\ttext_tar\ttext_file\n")
        for i, row in enumerate(rows):
            f.write(
                f"{IMG_TAR}\t{row['file']}\t{row['caption']}"
                f"\t{text_tar}\temb_{i:04d}.npy\n"
            )
    return str(tsv)


def test_reader_precomputed_embeddings(tmp_path):
    from ml_mdm_tpu.language_models.tokenizer import Tokenizer
    from ml_mdm_tpu.reader import ReaderConfig, get_dataset

    tsv = _build_embedding_fixture(tmp_path)
    cfg = ReaderConfig(
        image_size=16, smaller_side_size=16, max_token_length=16,
        num_readers=2, reader_buffer_size=4,
    )
    tok = Tokenizer(VOCAB, mode="t5")
    ds = get_dataset(tok, 2, tsv, cfg, num_epochs=1, load_numpy=True)
    batch = next(iter(ds))
    ds.close()
    assert batch["text_embedding"].shape == (2, 7, 16)
    assert batch["image"].shape == (2, 16, 16, 3)


def test_language_model_uses_precomputed(tmp_path):
    from ml_mdm_tpu.config import get_arguments
    from ml_mdm_tpu.language_models import factory

    os.chdir(REPO)
    args = get_arguments(
        args=["--config_path", YAML,
              "--use-precomputed-text-embeddings", "1"],
        mode="trainer",
    )
    tokenizer, lm = factory.create_lm(args)
    assert lm.encoder is None  # LM deleted (reference behaviour)
    emb = np.random.default_rng(1).normal(size=(2, 5, 16)).astype(
        np.float32
    )
    pad = tokenizer.token_id("<pad>")
    tokens = np.array([[5, 6, 7, pad, pad], [5, pad, pad, pad, pad]])
    out, mask = lm({"tokens": tokens, "text_embedding": emb}, tokenizer)
    assert out.shape == (2, 5, 16)
    np.testing.assert_array_equal(
        np.asarray(mask), (tokens != pad).astype(np.float32)
    )
    # padded positions zeroed by the mask
    assert np.abs(np.asarray(out)[1, 2:]).max() == 0.0


def test_resume_from_checkpoint(tmp_path):
    """Second run resumes batch_num/loss stats from the saved .pth."""
    from ml_mdm_tpu.config import get_arguments
    from ml_mdm_tpu.clis import train_parallel

    os.chdir(REPO)
    out = tmp_path / "run1"
    args = get_arguments(
        args=["--config_path", YAML, "--file-list", INDEX,
              "--output-dir", str(out), "--save-freq", "2",
              "--num-training-steps", "2"],
        mode="trainer",
    )
    state1 = train_parallel.main(args)
    assert int(state1.step) == 2

    out2 = tmp_path / "run2"
    args2 = get_arguments(
        args=["--config_path", YAML, "--file-list", INDEX,
              "--output-dir", str(out2), "--save-freq", "10",
              "--num-training-steps", "4",
              "--pretrained-vision-file",
              str(out / "vis_model_noema_000002.pth")],
        mode="trainer",
    )
    state2 = train_parallel.main(args2)
    assert int(state2.step) == 4  # resumed at 2, trained 2 more


def test_exact_resume_from_train_state(tmp_path):
    """--resume-from-train-state restores params+EMA+optimizer+step
    exactly (Orbax), continuing the optimizer trajectory."""
    from ml_mdm_tpu.config import get_arguments
    from ml_mdm_tpu.clis import train_parallel

    os.chdir(REPO)
    out = tmp_path / "orbax1"
    args = get_arguments(
        args=["--config_path", YAML, "--file-list", INDEX,
              "--output-dir", str(out), "--save-freq", "2",
              "--num-training-steps", "2"],
        mode="trainer",
    )
    state1 = train_parallel.main(args)

    out2 = tmp_path / "orbax2"
    args2 = get_arguments(
        args=["--config_path", YAML, "--file-list", INDEX,
              "--output-dir", str(out2), "--save-freq", "10",
              "--num-training-steps", "4",
              "--resume-from-train-state",
              str(out / "train_state_000002")],
        mode="trainer",
    )
    state2 = train_parallel.main(args2)
    assert int(state2.step) == 4
