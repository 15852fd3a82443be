"""End-to-end eval-generation: the real generate_batch.main on the
hermetic fixtures (reference test_generate_batch.py:12-40 pattern,
including the negative-prompt/CFG splice), chained into the FID CLI."""
import glob
import json
import os

import pytest

HERE = os.path.dirname(__file__)
REPO = os.path.dirname(HERE)
YAML = os.path.join(HERE, "test_files", "tiny_train.yaml")
INDEX = os.path.join(HERE, "test_files", "sample_training_0.tsv")


@pytest.fixture(scope="module")
def generated(tmp_path_factory):
    from ml_mdm_tpu.config import get_arguments
    from ml_mdm_tpu.clis import generate_batch

    out = tmp_path_factory.mktemp("gen_out")
    os.chdir(REPO)
    args = get_arguments(
        args=[
            "--config_path", YAML,
            "--test-file-list", INDEX,
            "--sample-dir", str(out),
            "--min-examples", "4",
            "--seed", "11",
        ],
        mode="sampler",
    )
    n = generate_batch.main(
        args,
        negative_prompt="low quality",
        guidance_scale=2.0,  # exercises the CFG token-splicing branch
        num_inference_steps=4,
        ddim_eta=0.0,
    )
    return args, out, n


def test_writes_samples_and_manifest(generated):
    args, out, n = generated
    assert n >= 4
    rank_dir = os.path.join(str(out), "rank0")
    with open(os.path.join(rank_dir, "lst.json")) as f:
        manifest = json.load(f)
    assert len(manifest) == n
    for fname in manifest:
        assert os.path.exists(os.path.join(rank_dir, fname))
    assert glob.glob(os.path.join(rank_dir, "ref_*.png"))
    assert os.path.exists(os.path.join(str(out), "index.html"))


def test_metrics_on_generated(generated):
    """Full loop: generate_batch output straight into the FID CLI."""
    from ml_mdm_tpu.clis import run_torchmetrics as rt

    args, out, n = generated
    results = rt.main([
        "--sample-dir", str(out),
        "--min-examples", str(n),
        "--metrics", "fid",
        "--feature-extractor", "pixel",
    ])
    assert "fid" in results and results["fid"] >= 0.0
