"""Multi-HOST (multi-process) eval generation: 2 coordinator-wired CPU
processes run the real generate_batch CLI end-to-end — per-rank reader
partitions, per-rank ``rank{r}/lst.json`` manifests + sample PNGs — and
the chained FID CLI reads BOTH manifests, exactly the reference's
torchrun'd protocol (reference generate_batch.py:104-107,171-176 and
run_torchmetrics.py:52-59).
"""
import glob
import json
import os
import subprocess
import sys

import pytest

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)


@pytest.fixture(scope="module")
def mp_gen(tmp_path_factory):
    """Launch the 2-process generation once; tests assert on artifacts."""
    out = tmp_path_factory.mktemp("mp_gen_out")
    port = "8919"
    env_base = {
        k: v for k, v in os.environ.items()
        if k not in ("JAX_PLATFORMS", "XLA_FLAGS", "MASTER_ADDR",
                     "MASTER_PORT", "WORLD_SIZE", "RANK")
    }
    procs = [
        subprocess.Popen(
            [sys.executable, os.path.join(HERE, "mp_gen_child.py"),
             str(rank), port, str(out)],
            env=env_base, cwd=REPO,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        )
        for rank in range(2)
    ]
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
        with open(os.path.join(str(out), f"gen_record_{rank}.json")) as f:
            records.append(json.load(f))
    return out, records


@pytest.mark.slow
def test_both_ranks_wrote_disjoint_shards(mp_gen):
    out, records = mp_gen
    for r in records:
        assert r["process_count"] == 2
        assert r["n"] >= 4  # min_examples 8 split over 2 ranks
    manifests = {}
    for rank in range(2):
        path = os.path.join(str(out), f"rank{rank}", "lst.json")
        assert os.path.exists(path), f"rank{rank} manifest missing"
        with open(path) as f:
            manifests[rank] = json.load(f)
        # every manifest entry has its sample PNG on disk
        for fname in manifests[rank]:
            assert os.path.exists(os.path.join(str(out), f"rank{rank}",
                                               fname))
        assert glob.glob(os.path.join(str(out), f"rank{rank}",
                                      "ref_*.png"))
    # the two ranks consumed DISJOINT eval partitions (different captions)
    caps0 = set(manifests[0].values())
    caps1 = set(manifests[1].values())
    assert caps0 and caps1
    assert caps0 != caps1


@pytest.mark.slow
def test_metrics_reads_both_rank_manifests(mp_gen):
    """The chained FID CLI must aggregate images across rank0 AND rank1
    (reference run_torchmetrics.py:52-59 polls rank*/lst.json)."""
    from ml_mdm_tpu.clis import run_torchmetrics as rt

    out, records = mp_gen
    total = records[0]["n"] + records[1]["n"]
    refs, _ = rt.load_images(str(out), "ref_", total)
    samples, _ = rt.load_images(str(out), "s_", total)
    # images from both ranks were aggregated, not just rank0's
    assert len(samples) == total
    assert len(samples) > records[0]["n"]
    assert len(refs) > 0
    results = rt.main([
        "--sample-dir", str(out),
        "--min-examples", str(total),
        "--metrics", "fid",
        "--feature-extractor", "pixel",
    ])
    assert "fid" in results and results["fid"] >= 0.0
