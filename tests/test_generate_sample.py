"""Demo CLI headless logic: setup_models + generate() with CFG and the
streaming path on the tiny hermetic config (the reference exercises this
surface only interactively through Gradio)."""
import os

import numpy as np
import pytest

HERE = os.path.dirname(__file__)
REPO = os.path.dirname(HERE)
YAML = os.path.join(HERE, "test_files", "tiny_train.yaml")


@pytest.fixture(scope="module")
def models():
    from ml_mdm_tpu.config import get_arguments
    from ml_mdm_tpu.clis import generate_sample as gs

    os.chdir(REPO)
    args = get_arguments(args=["--config_path", YAML], mode="demo")
    return gs.setup_models(args)


def test_generate_final_grid(models):
    from ml_mdm_tpu.clis.generate_sample import generate

    grid, info = generate(
        models,
        "a bird on a branch",
        negative_prompt="low quality",
        batch_size=2,
        guidance_scale=2.0,
        num_inference_steps=4,
        seed=3,
    )
    assert grid.ndim == 3 and grid.shape[-1] == 3
    assert np.isfinite(grid).all()
    assert grid.min() >= -1.0 and grid.max() <= 1.0
    assert info["steps"] == 4 and len(info["gammas"]) > 0


def test_generate_stream_yields_steps(models):
    from ml_mdm_tpu.clis.generate_sample import generate

    steps = list(
        generate(
            models,
            "a cat",
            batch_size=1,
            guidance_scale=1.0,
            num_inference_steps=3,
            stream=True,
        )
    )
    assert len(steps) == 3
    for grid, info in steps:
        assert np.isfinite(grid).all()
        assert "logsnr" in info
    # logSNR increases monotonically as t decreases toward 0
    snrs = [info["logsnr"] for _, info in steps]
    assert snrs[-1] > snrs[0]


def test_run_demo_events(models):
    """run_demo yields per-step previews then a final event carrying the
    logSNR plot and a diffusion-path animation (reference demo surface,
    generate_sample.py:238-305)."""
    from ml_mdm_tpu.clis.generate_sample import run_demo

    events = list(
        run_demo(
            models, "a cat", batch_size=1, guidance_scale=1.0,
            num_inference_steps=3, show_diffusion_path=True,
            save_diffusion_path=True, seed=1,
        )
    )
    kinds = [e["kind"] for e in events]
    assert kinds == ["preview"] * 3 + ["final"]
    fin = events[-1]
    assert fin["image"].dtype == np.uint8
    assert fin["logsnr_plot"] is not None  # matplotlib present in CI
    assert fin["video_path"] and os.path.exists(fin["video_path"])
    os.unlink(fin["video_path"])


def test_run_demo_fast_path_has_logsnr(models):
    """Without any per-step artifact request the compiled one-program
    sampler runs and the final event still carries the logSNR curve."""
    from ml_mdm_tpu.clis.generate_sample import run_demo

    events = list(
        run_demo(models, "a dog", batch_size=1, guidance_scale=1.0,
                 num_inference_steps=2)
    )
    assert [e["kind"] for e in events] == ["final"]
    assert events[0]["logsnr_plot"] is not None
    assert events[0]["video_path"] is None


def test_builtin_server_sse_stream(models):
    """Drive the builtin HTTP UI headlessly: the SSE endpoint must emit
    >1 preview frame then a final image (+ logSNR plot + animation)."""
    import json
    import threading
    import urllib.request

    from ml_mdm_tpu.config import get_arguments
    from ml_mdm_tpu.clis import generate_sample as gs

    args = get_arguments(args=["--config_path", YAML], mode="demo")
    args.model_file = ""
    server = gs.make_builtin_server(args, port=0)
    port = server.server_port
    threading.Thread(target=server.serve_forever, daemon=True).start()
    try:
        ch = json.loads(
            urllib.request.urlopen(
                f"http://127.0.0.1:{port}/choices", timeout=60
            ).read()
        )
        assert any(c.endswith(".yaml") for c in ch["configs"])
        q = (
            "prompt=a+cat&batch_size=1&guidance_scale=1.0"
            "&num_inference_steps=3&stream=1&save_path=1&seed=0"
        )
        resp = urllib.request.urlopen(
            f"http://127.0.0.1:{port}/generate?{q}", timeout=600
        )
        assert resp.headers["Content-Type"].startswith("text/event-stream")
        events, buf = [], b""
        while True:
            chunk = resp.read(4096)
            if not chunk:
                break
            buf += chunk
            while b"\n\n" in buf:
                frame, buf = buf.split(b"\n\n", 1)
                if frame.startswith(b"data: "):
                    events.append(json.loads(frame[6:]))
        kinds = [e["kind"] for e in events]
        assert kinds.count("preview") >= 2 and kinds[-1] == "final", kinds
        fin = events[-1]
        assert len(fin["image"]) > 100
        assert "logsnr_plot" in fin
        assert fin.get("video_mime") in ("image/gif", "video/mp4")
    finally:
        server.shutdown()


def test_style_templates_apply(models):
    from ml_mdm_tpu.clis.generate_sample import STYLE_TEMPLATES

    assert "{prompt}" in STYLE_TEMPLATES["photo"]
    assert STYLE_TEMPLATES["photo"].format(prompt="x").startswith(
        "a photograph of x"
    )


def test_gradio_blocks_app_smoke(models):
    """Build the real gradio Blocks app and drive its Run callback as a
    generator: preview tuples stream (image, None, text, None), the
    final tuple carries image + logSNR plot (reference demo protocol,
    generate_sample.py:318-560). Dormant where gradio isn't installed —
    the builtin SSE UI carries the coverage there."""
    pytest.importorskip("gradio")
    from ml_mdm_tpu.config import get_arguments
    from ml_mdm_tpu.clis import generate_sample as gs

    os.chdir(REPO)
    args = get_arguments(args=["--config_path", YAML], mode="demo")
    demo, run = gs.build_gradio_app(args)
    assert demo is not None

    outs = list(run(
        YAML, "", "a cat", "", "none", 1, 1.0, "CLIP",
        3, 0.0, 7, True, False, False, False,
    ))
    assert len(outs) == 4  # 3 previews + final
    for img, snr, text, video in outs[:-1]:
        assert img.dtype == np.uint8 and snr is None
        assert "Step" in text
    img, snr, text, video = outs[-1]
    assert img.dtype == np.uint8
    assert snr is not None and snr.dtype == np.uint8
    assert "Done" in text
