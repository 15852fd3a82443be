"""Auxiliary subsystems: logger throttling, HTML gallery, s3 path logic,
distributed helpers on a single process."""
import os

import numpy as np
import pytest


# ---------------------------------------------------------------------------
# logger
# ---------------------------------------------------------------------------


class _RecordingSink:
    def __init__(self):
        self.scalars = []
        self.batch_num = 0

    def add_scalar(self, name, value):
        self.scalars.append((self.batch_num, name, value))

    def add_figure(self, name, value):
        pass

    def add_scalars(self, name, value):
        pass


def test_logger_frequency_throttle(tmp_path):
    """Per-metric frequency throttling (reference simple_logger.py:67-74):
    a scalar is forwarded at most once per logging_freq batches."""
    from ml_mdm_tpu.utils.simple_logger import Logger

    logger = Logger(str(tmp_path), logging_freq=5)
    sink = _RecordingSink()
    sink.next_logger = None
    logger.next_logger = sink
    for step in range(20):
        logger.batch_num = step
        logger.add_scalar("loss", float(step))
    steps = [s for s, n, v in sink.scalars if n == "loss"]
    assert len(steps) <= 5, steps
    assert steps == sorted(steps)


def test_html_gallery(tmp_path):
    from ml_mdm_tpu.generate_html import create_html

    items = [(f"img_{i}.png", f"caption {i}") for i in range(4)]
    out = tmp_path / "index.html"
    create_html(str(out), len(items), items)
    html = out.read_text()
    assert "img_2.png" in html and "caption 3" in html


# ---------------------------------------------------------------------------
# s3 helpers (pure logic; no network)
# ---------------------------------------------------------------------------


def test_parse_s3_path():
    from ml_mdm_tpu.s3_helpers import parse_s3_path

    b, k = parse_s3_path("s3://mlx/datasets/cc12m-64x64/images_001.tsv")
    assert b == "mlx" and k == "datasets/cc12m-64x64/images_001.tsv"
    with pytest.raises(ValueError):
        parse_s3_path("/local/path.tsv")


def test_shard_for_node():
    from ml_mdm_tpu.s3_helpers import shard_for_node

    paths = [f"p{i}" for i in range(10)]
    shards = [shard_for_node(paths, n, 3) for n in range(3)]
    flat = sorted(p for s in shards for p in s)
    assert flat == sorted(paths)          # complete
    assert not set(shards[0]) & set(shards[1])  # disjoint


# ---------------------------------------------------------------------------
# distributed (single process)
# ---------------------------------------------------------------------------


def test_distributed_single_process():
    from ml_mdm_tpu import distributed as dist

    local, rank, world = dist.init_distributed_singlenode()
    assert rank == 0 and world >= 1
    assert dist.get_rank() == 0
    assert dist.get_world_size() >= 1
    dist.barrier("test")  # no-op single process but must not raise
    dist.print0("rank0 print works")


# ---------------------------------------------------------------------------
# tar downloader (local-file path; no network)
# ---------------------------------------------------------------------------


def test_download_tar_from_index_local(tmp_path):
    """Local shards: fetch + TSV tar-column rewrite, node sharding."""
    from ml_mdm_tpu.clis import download_tar_from_index as dl

    src_dir = tmp_path / "src"
    os.makedirs(src_dir)
    for i in range(4):
        (src_dir / f"shard_{i}.tar").write_bytes(b"x" * 100)
    index = tmp_path / "index.tsv"
    with open(index, "w") as f:
        f.write("tar\tfile\tcaption\n")
        for i in range(4):
            f.write(f"{src_dir}/shard_{i}.tar\timg_{i}.jpg\tcap {i}\n")

    dest = tmp_path / "dest"
    out = dl.main([
        "--index-file", str(index),
        "--dest-dir", str(dest),
        "--node-id", "0", "--num-nodes", "2",
        "--num-workers", "2",
    ])
    header, rows = dl.read_index(out)
    assert header == ["tar", "file", "caption"]
    assert len(rows) == 2  # half the shards for node 0 of 2
    for row in rows:
        assert row[0].startswith(str(dest))
        assert os.path.exists(row[0])


def test_rate_limiter_caps_throughput():
    import time as _time

    from ml_mdm_tpu.clis.download_tar_from_index import RateLimiter

    rl = RateLimiter(bytes_per_sec=10000)
    t0 = _time.monotonic()
    for _ in range(5):
        rl.consume(1000)  # 5kB at 10kB/s -> >= ~0.4s
    assert _time.monotonic() - t0 >= 0.3


def test_checkpoint_load_tolerates_missing_classes(tmp_path):
    """Old reference checkpoints pickle args Namespaces holding classes
    from modules that do not exist here; loading must survive
    (fix_old_checkpoints parity, strictly more robust)."""
    import sys
    import types

    import jax.numpy as jnp
    import torch

    from ml_mdm_tpu.utils.torch_compat import load_torch_checkpoint

    # fabricate a class in a throwaway module, pickle it, delete module
    mod = types.ModuleType("vanished_reference_module")

    class OldConfig:
        def __init__(self):
            self.lr = 5e-5

    OldConfig.__module__ = "vanished_reference_module"
    OldConfig.__qualname__ = "OldConfig"
    mod.OldConfig = OldConfig
    sys.modules["vanished_reference_module"] = mod

    fname = tmp_path / "old.pth"
    torch.save(
        {
            "state_dict": {"w": torch.ones(3)},
            "batch_num": 7,
            "args": OldConfig(),
        },
        str(fname),
    )
    del sys.modules["vanished_reference_module"]

    template = {"w": jnp.zeros((3,))}
    params, other = load_torch_checkpoint(str(fname), template)
    assert other["batch_num"] == 7
    assert float(params["w"][0]) == 1.0
    assert other["args"].__dict__.get("lr") == 5e-5  # state preserved


def test_scraper_parquet_to_tsv_and_split(tmp_path):
    """img2dataset shard postprocessing: parquet -> (tar,file,caption)
    TSV, then train/validation index split (scrape_cc12m.py parity)."""
    pd = pytest.importorskip("pandas")
    from ml_mdm_tpu.clis.scrape_cc12m import convert_parquets, split_index

    out = str(tmp_path)
    for shard in ("00000", "00001", "00002"):
        df = pd.DataFrame(
            {
                "key": [f"{shard}{i}" for i in range(3)],
                "caption": ["a cat", "tab\there", "ok"],
                "status": ["success", "success", "failed"],
            }
        )
        df.to_parquet(os.path.join(out, f"{shard}.parquet"))
        open(os.path.join(out, f"{shard}.tar"), "wb").write(b"")

    tsvs = convert_parquets(out)
    assert len(tsvs) == 3
    lines = open(tsvs[0]).read().splitlines()
    assert lines[0] == "tar\tfile\tcaption"
    assert len(lines) == 3  # failed row dropped
    assert "tab here" in lines[2]  # tab in caption sanitised

    split_index(out, validation_shards=1)
    train = open(os.path.join(out, "training.tsv")).read().splitlines()
    val = open(os.path.join(out, "validation.tsv")).read().splitlines()
    assert train[0] == "filename" and len(train) == 3
    assert len(val) == 2


def test_core_cli_builder(tmp_path):
    """Generic CLI builder (reference ml-mdm core.py parity)."""
    import dataclasses

    from ml_mdm_tpu.core import CLIBuilder

    @dataclasses.dataclass
    class Cfg:
        lr: float = 0.1
        name: str = "x"
        steps: int = 1

    captured = {}

    class Runner:
        def __init__(self, config):
            captured["cfg"] = config

    cfgfile = tmp_path / "c.yaml"
    cfgfile.write_text("lr: 0.5\nname: from_yaml\n")
    builder = CLIBuilder(class_to_call=Runner, config_class=Cfg)
    builder.run(["--config-file", str(cfgfile), "--steps", "7"])
    cfg = captured["cfg"]
    assert cfg.lr == 0.5          # yaml
    assert cfg.name == "from_yaml"
    assert cfg.steps == 7         # CLI override beats default


def test_core_parse_value_string_annotations():
    """Under `from __future__ import annotations` dataclass field types
    are strings — coercion must still apply (review regression)."""
    from ml_mdm_tpu.core import _parse_value

    assert _parse_value("int", "7") == 7
    assert _parse_value("float", "0.5") == 0.5
    assert _parse_value("bool", "true") is True
    assert _parse_value(int, "3") == 3
    assert _parse_value("SomethingElse", "x") == "x"
