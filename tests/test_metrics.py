"""Hermetic FID/CLIP evaluation test: fabricated rank manifests + PNGs
through the real run_torchmetrics.main with the weight-free pixel
extractor (reference protocol: rank*/lst.json + ref_/s_ image pairs)."""
import json
import os

import numpy as np
import pytest

PIL = pytest.importorskip("PIL")
from PIL import Image  # noqa: E402


def _make_rank(sample_dir, rank, n, rng, shift=0):
    d = os.path.join(sample_dir, f"rank{rank}")
    os.makedirs(d)
    manifest = {}
    for i in range(n):
        base = rng.integers(0, 200, size=(32, 32, 3), dtype=np.uint8)
        Image.fromarray(base).save(os.path.join(d, f"ref_{i:04d}.png"))
        sample = np.clip(base.astype(int) + shift, 0, 255).astype(np.uint8)
        Image.fromarray(sample).save(os.path.join(d, f"s_{i:04d}.png"))
        manifest[f"s_{i:04d}.png"] = f"caption {i}"
    with open(os.path.join(d, "lst.json"), "w") as f:
        json.dump(manifest, f)


def test_fid_pixel_extractor(tmp_path):
    from ml_mdm_tpu.clis import run_torchmetrics as rt

    rng = np.random.default_rng(0)
    sample_dir = str(tmp_path / "samples")
    os.makedirs(sample_dir)
    _make_rank(sample_dir, 0, 12, rng, shift=40)
    _make_rank(sample_dir, 1, 12, rng, shift=40)

    results = rt.main([
        "--sample-dir", sample_dir,
        "--min-examples", "24",
        "--metrics", "fid",
        "--feature-extractor", "pixel",
    ])
    assert "fid" in results
    assert results["fid"] > 0.0
    assert np.isfinite(results["fid"])


def test_fid_identical_sets_is_zero(tmp_path):
    from ml_mdm_tpu.clis import run_torchmetrics as rt

    rng = np.random.default_rng(1)
    sample_dir = str(tmp_path / "samples")
    os.makedirs(sample_dir)
    _make_rank(sample_dir, 0, 16, rng, shift=0)  # samples == references

    results = rt.main([
        "--sample-dir", sample_dir,
        "--min-examples", "16",
        "--metrics", "fid",
        "--feature-extractor", "pixel",
    ])
    assert abs(results["fid"]) < 1e-4


def test_frechet_distance_known_value():
    from ml_mdm_tpu.clis.run_torchmetrics import frechet_distance

    mu1, mu2 = np.zeros(3), np.ones(3)
    s = np.eye(3)
    # identical covariances: FID = ||mu1-mu2||^2
    assert abs(frechet_distance(mu1, s, mu2, s) - 3.0) < 1e-6
