"""Native (C++) data-core parity tests: the ctypes fast paths must agree
with the pure-Python reference implementations (tokenize, tar reads) and
produce equivalent images (decode/resize/crop)."""
import os
import tarfile

import numpy as np
import pytest

from ml_mdm_tpu import native

HERE = os.path.dirname(__file__)
TAR = os.path.join(HERE, "test_files", "images_00000.tar")
VOCAB = os.path.join(HERE, "test_files", "tiny_t5.vocab")

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native datacore not built"
)


def test_tokenizer_parity():
    from ml_mdm_tpu.language_models import tokenizer as tok_mod
    from ml_mdm_tpu.native.trie_tokenizer import NativeTokenizer

    tok = tok_mod.Tokenizer(VOCAB, mode="t5")
    nat = NativeTokenizer(tok.trie, tok.trie_key_scores)
    texts = [
        " a photo of artwork",
        " the beach and the sea",
        "unknownbytes \xe2\x82\xac here",
        "",
        " a a a a a",
    ]
    for t in texts:
        py = tok_mod.tokenize_shortest(
            tok.trie, t, tok.trie_key_scores, ignore_unk=True
        )
        assert nat.tokenize_shortest(t, use_scores=True) == py, t
        py_u = tok_mod.tokenize_shortest(tok.trie, t, None, ignore_unk=True)
        assert nat.tokenize_shortest(t, use_scores=False) == py_u, t


def test_tar_parity():
    from ml_mdm_tpu.native.tar import NativeTar

    nt = NativeTar(TAR)
    with tarfile.open(TAR) as tf:
        members = [m for m in tf.getmembers() if m.isfile()]
        assert members
        for m in members:
            expected = tf.extractfile(m).read()
            assert nt.read(m.name) == expected
    assert nt.read("no/such/member.jpg") is None


def test_image_decode_matches_pil():
    from ml_mdm_tpu.native.image import decode_resize_crop, is_jpeg
    from ml_mdm_tpu import reader as reader_mod

    with tarfile.open(TAR) as tf:
        member = next(m for m in tf.getmembers() if m.isfile())
        data = tf.extractfile(member).read()
    assert is_jpeg(data)

    out = decode_resize_crop(data, smaller_side=40, crop=40)
    assert out is not None
    assert out.shape == (40, 40, 3) and out.dtype == np.uint8

    img = reader_mod._load_image(data)
    img = reader_mod._resize_smallest_side(img, 40)
    img = reader_mod._crop(img, 40, False, np.random.default_rng(0))
    ref = np.asarray(img, dtype=np.uint8)
    # same libjpeg decode + same antialiased triangle resampler: only
    # float-rounding differences remain
    diff = np.abs(out.astype(int) - ref.astype(int))
    assert diff.max() <= 2 and diff.mean() < 1.0, (diff.max(), diff.mean())


def test_image_random_crop_deterministic_per_seed():
    from ml_mdm_tpu.native.image import decode_resize_crop

    with tarfile.open(TAR) as tf:
        member = next(m for m in tf.getmembers() if m.isfile())
        data = tf.extractfile(member).read()
    a = decode_resize_crop(data, 48, 32, random_crop=True, seed=7)
    b = decode_resize_crop(data, 48, 32, random_crop=True, seed=7)
    np.testing.assert_array_equal(a, b)


def test_reader_uses_native_path():
    """End-to-end reader batch with the native decode path active."""
    from ml_mdm_tpu.language_models.tokenizer import Tokenizer
    from ml_mdm_tpu.reader import ReaderConfig, get_dataset

    cfg = ReaderConfig(
        image_size=40, smaller_side_size=40, max_token_length=32,
        num_readers=2, reader_buffer_size=4, shuffle_buffer_size=4,
    )
    tok = Tokenizer(VOCAB, mode="t5")
    ds = get_dataset(
        tok, batch_size=2,
        file_list=os.path.join(HERE, "test_files", "images_00000.tsv"),
        config=cfg, num_epochs=1,
    )
    batch = next(iter(ds))
    ds.close()
    assert batch["image"].shape == (2, 40, 40, 3)
    assert batch["image"].dtype == np.uint8
    assert batch["tokens"].ndim == 2


def test_tar_pax_format_long_names(tmp_path):
    """Python tarfile writes PAX format by default; long / non-ASCII
    member names ride in 'x' extended headers the indexer must honor."""
    import io as _io

    from ml_mdm_tpu.native.tar import NativeTar

    long_name = "dir/" + "x" * 150 + "/image_é.jpg"
    payload = b"jpegbytes" * 10
    path = tmp_path / "pax.tar"
    with tarfile.open(path, "w", format=tarfile.PAX_FORMAT) as tf:
        info = tarfile.TarInfo(name=long_name)
        info.size = len(payload)
        tf.addfile(info, _io.BytesIO(payload))
        short = tarfile.TarInfo(name="short.jpg")
        short.size = 3
        tf.addfile(short, _io.BytesIO(b"abc"))

    nt = NativeTar(str(path))
    assert nt.read(long_name) == payload
    assert nt.read("short.jpg") == b"abc"


def test_tar_gnu_format_long_names(tmp_path):
    import io as _io

    from ml_mdm_tpu.native.tar import NativeTar

    long_name = "g/" + "y" * 140 + ".jpg"
    path = tmp_path / "gnu.tar"
    with tarfile.open(path, "w", format=tarfile.GNU_FORMAT) as tf:
        info = tarfile.TarInfo(name=long_name)
        info.size = 4
        tf.addfile(info, _io.BytesIO(b"data"))
    nt = NativeTar(str(path))
    assert nt.read(long_name) == b"data"


def test_image_decode_corrupt_jpeg_returns_none():
    from ml_mdm_tpu.native.image import decode_resize_crop

    with tarfile.open(TAR) as tf:
        member = next(m for m in tf.getmembers() if m.isfile())
        data = tf.extractfile(member).read()
    # keep headers, truncate mid-scan: libjpeg errors, wrapper -> None
    corrupt = data[: len(data) // 2]
    out = decode_resize_crop(corrupt, 40, 40)
    # truncated scans either decode partially (finite) or fail cleanly
    assert out is None or out.shape == (40, 40, 3)
    garbage = b"\xff\xd8\xff" + b"\x00" * 100
    assert decode_resize_crop(garbage, 40, 40) is None
