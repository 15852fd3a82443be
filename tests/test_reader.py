"""Input pipeline tests on the hermetic tar/TSV fixtures (the reference's
test strategy: real pipeline, no mocks — SURVEY.md §4)."""
import os

import numpy as np
import pytest

from ml_mdm_tpu.language_models.tokenizer import Tokenizer
from ml_mdm_tpu.reader import (
    ReaderConfig,
    convert,
    get_dataset,
    get_dataset_partition,
    process_text,
)

HERE = os.path.dirname(__file__)
INDEX = os.path.join(HERE, "test_files", "sample_training_0.tsv")
VOCAB = os.path.join(HERE, "test_files", "tiny_t5.vocab")


@pytest.fixture(scope="module")
def tokenizer():
    return Tokenizer(VOCAB, mode="t5")


def _cfg(**kw):
    base = dict(
        image_size=40,
        smaller_side_size=40,
        max_caption_length=512,
        max_token_length=32,
        num_readers=2,
        reader_buffer_size=8,
        shuffle_buffer_size=8,
    )
    base.update(kw)
    return ReaderConfig(**base)


def test_dataset_shapes(tokenizer):
    ds = get_dataset(
        tokenizer, 2, INDEX, _cfg(), num_epochs=1, is_index_file=True
    )
    batch = next(iter(ds))
    assert batch["image"].shape == (2, 40, 40, 3)
    assert batch["image"].dtype == np.uint8
    assert batch["tokens"].ndim == 2
    assert batch["caption"].ndim == 2


def test_dataset_partition_disjoint(tokenizer):
    seen = []
    for part in range(2):
        ds = get_dataset_partition(
            part, 2, tokenizer, 1, INDEX, _cfg(), num_epochs=1,
            is_index_file=True,
        )
        caps = [convert(b["caption"][0]) for b in ds]
        seen.append(set(caps))
    assert seen[0].isdisjoint(seen[1])
    assert len(seen[0] | seen[1]) == 10


def test_token_filter_drops_long(tokenizer):
    ds = get_dataset(
        tokenizer, 10, INDEX, _cfg(max_token_length=2), num_epochs=1,
        is_index_file=True,
    )
    batches = list(ds)
    assert batches == [] or all(b["tokens"].shape[1] <= 2 for b in batches)


def test_process_text(tokenizer):
    cfg = _cfg(max_token_length=16)
    toks = process_text(["a red circle", "green gradient"], tokenizer, cfg)
    assert len(toks) == 2
    assert len(toks[0]) == len(toks[1])  # padded to common length
    assert toks[0][-1] in (tokenizer.eos, tokenizer.pad)
    # round-trip through token ids
    text = tokenizer.tokens2text(
        [t for t in toks[0] if t != tokenizer.pad]
    )
    assert "red circle" in text


def test_convert_roundtrip():
    arr = np.frombuffer(b"hello world", dtype=np.uint8)
    assert convert(arr) == "hello world"


def test_shuffle_buffer_permutes_rows_deterministically():
    """shuffle_buffer_size: all rows are yielded exactly once, in a
    seed-deterministic, non-source order (reference: mlx.data shuffle)."""
    from ml_mdm_tpu.reader import _sample_rows

    import tempfile

    with tempfile.TemporaryDirectory() as d:
        tsv = os.path.join(d, "rows.tsv")
        with open(tsv, "w") as f:
            f.write("tar\tfile\tcaption\n")
            for i in range(50):
                f.write(f"t.tar\tf{i}.jpg\tcap {i}\n")

        def run(seed):
            return [
                r["file"]
                for r in _sample_rows(
                    tsv, False, 1, shuffle_buffer_size=16, seed=seed
                )
            ]

        a, b, c = run(0), run(0), run(1)
    assert sorted(a) == sorted(f"f{i}.jpg" for i in range(50))  # complete
    assert a == b          # deterministic per seed
    assert a != c          # seed changes order
    assert a != [f"f{i}.jpg" for i in range(50)]  # actually shuffled


def test_num_kept_files_limits_shards(tmp_path):
    from ml_mdm_tpu.reader import _sample_rows

    shards = []
    for s in range(3):
        p = tmp_path / f"shard{s}.tsv"
        with open(p, "w") as f:
            f.write("tar\tfile\tcaption\n")
            f.write(f"t.tar\ts{s}.jpg\tc\n")
        shards.append(str(p))
    index = tmp_path / "index.tsv"
    with open(index, "w") as f:
        f.write("filename\n")
        for p in shards:
            f.write(p + "\n")
    rows = list(_sample_rows(str(index), True, 1, num_kept_files=2))
    assert len(rows) == 2
