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


def plot_logsnr(logsnrs, total_steps: int):
    """Render the per-step logSNR curve to a uint8 RGB image (the demo's
    'Noise schedule' pane, reference generate_sample.py:81-100). Returns
    None when matplotlib is unavailable."""
    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
    except ImportError:
        return None
    x = 1 - np.arange(len(logsnrs)) / max(total_steps - 1, 1)
    fig, ax = plt.subplots(figsize=(5, 3.2), dpi=100)
    ax.plot(x[: len(logsnrs)], np.asarray(logsnrs))
    ax.set_xlabel("timesteps")
    ax.set_ylabel("LogSNR")
    ax.grid(True)
    ax.set_xlim(0, 1)
    ax.set_ylim(-20, 10)
    ax.invert_xaxis()
    fig.tight_layout()
    fig.canvas.draw()
    img = np.asarray(fig.canvas.buffer_rgba())[..., :3].copy()
    plt.close(fig)
    return img


def write_animation(frames, path_base: str, fps: int = 16):
    """Write the diffusion-path animation (reference :276-282 writes an
    mp4 via imageio). Uses imageio/mp4 when available, else a PIL GIF —
    dependency-free. Returns the written path or None."""
    if not frames:
        return None
    try:
        import imageio

        path = path_base + ".mp4"
        w = imageio.get_writer(path, fps=fps)
        for f in frames:
            w.append_data(f)
        w.close()
        return path
    except Exception:
        # no imageio, or imageio without an ffmpeg backend -> GIF
        pass
    try:
        from PIL import Image
    except ImportError:
        return None
    path = path_base + ".gif"
    pil = [Image.fromarray(f) for f in frames]
    pil[0].save(
        path, save_all=True, append_images=pil[1:],
        duration=max(1000 // fps, 20), loop=0,
    )
    return path


def _to_uint8(arr_m1_1: np.ndarray) -> np.ndarray:
    return np.clip(
        np.asarray(arr_m1_1, np.float32) * 128.0 + 127.0, 0, 255
    ).astype(np.uint8)


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
    show_xt: bool = False,
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
                x = x_t if show_xt else x0
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


def run_demo(
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
    save_diffusion_path: bool = False,
    show_diffusion_path: bool = False,
    show_xt: bool = False,
    output_inner: bool = False,
    anim_dir: Optional[str] = None,
):
    """Full-featured demo run mirroring the reference generate() generator
    (generate_sample.py:206-305): yields dict events —

      {"kind": "preview", "image": uint8 HWC, "step", "total", "text"}
        per denoise step when show_diffusion_path (streamed previews);
      {"kind": "final", "image", "logsnr_plot": uint8|None,
       "video_path": str|None, "text", "info"}
        once at the end (logSNR curve + optional path animation).

    Streaming (per-step jit, compiled once) is engaged only when a
    per-step artifact is requested; otherwise the one-program compiled
    sampler runs and only the final event is yielded.
    """
    common = dict(
        negative_prompt=negative_prompt, style=style, batch_size=batch_size,
        guidance_scale=guidance_scale, threshold_function=threshold_function,
        num_inference_steps=num_inference_steps, ddim_eta=ddim_eta,
        seed=seed, output_inner=output_inner,
    )
    t0 = time.time()
    need_stream = save_diffusion_path or show_diffusion_path or show_xt
    logsnrs = []
    if need_stream:
        frames = []
        grid = None
        for step_i, (grid, info) in enumerate(
            generate(models, prompt, stream=True, show_xt=show_xt, **common)
        ):
            logsnrs.append(info["logsnr"])
            if save_diffusion_path:
                frames.append(_to_uint8(grid))
            if show_diffusion_path:
                yield {
                    "kind": "preview",
                    "image": _to_uint8(grid),
                    "step": step_i,
                    "total": num_inference_steps,
                    "text": f"Step ({step_i + 1} / {num_inference_steps}) "
                            f"Time ({time.time() - t0:.4}s)",
                }
        video_path = None
        if save_diffusion_path and frames:
            import tempfile

            base = os.path.join(
                anim_dir or tempfile.gettempdir(),
                f"diffusion_path_{os.getpid()}",
            )
            video_path = write_animation(frames, base)
        final_grid, info = grid, {"steps": num_inference_steps}
    else:
        final_grid, info = generate(models, prompt, stream=False, **common)
        # logSNR curve from the resampled timestep table (no streaming
        # needed — it is a property of the schedule, not the images)
        ts = models["pipeline"].sampler._timestep_table(
            num_inference_steps, True, -1
        )
        gam = np.asarray(models["pipeline"].sampler.gammas)
        for t in ts[:-1]:
            g = float(gam[int(t)])
            logsnrs.append(
                float(np.log(max(g, 1e-8) / max(1 - g, 1e-8)))
            )
        video_path = None
    yield {
        "kind": "final",
        "image": _to_uint8(final_grid),
        "logsnr_plot": plot_logsnr(logsnrs, num_inference_steps),
        "video_path": video_path,
        "text": f"Done ({num_inference_steps} steps, "
                f"{time.time() - t0:.4}s)",
        "info": info,
    }


def list_demo_choices(args):
    """Config/checkpoint dropdown sources: YAMLs under --config-dir and
    .pth/orbax checkpoints under --model-dir (reference hardcodes three
    of each, generate_sample.py:338-362)."""
    import glob

    cfg_dir = getattr(args, "config_dir", "configs/models") or "configs/models"
    mdl_dir = getattr(args, "model_dir", ".") or "."
    configs = sorted(glob.glob(os.path.join(cfg_dir, "*.yaml")))
    ckpts = sorted(
        glob.glob(os.path.join(mdl_dir, "*.pth"))
        + glob.glob(os.path.join(mdl_dir, "vis_model*"))
    )
    cur_cfg = getattr(args, "config_path", None)
    if cur_cfg and cur_cfg not in configs:
        configs.insert(0, cur_cfg)
    cur_ckpt = getattr(args, "model_file", None)
    if cur_ckpt and cur_ckpt not in ckpts:
        ckpts.insert(0, cur_ckpt)
    return configs, [c for c in dict.fromkeys(ckpts) if c]


# ---------------------------------------------------------------------------
# builtin HTTP UI (gradio-free fallback)
# ---------------------------------------------------------------------------

_PAGE = """<!DOCTYPE html><html><head><title>ml_mdm_tpu demo</title>
<style>body{font-family:sans-serif;max-width:960px;margin:2em auto}
label{display:block;margin-top:.6em}img{image-rendering:pixelated;
max-width:512px;border:1px solid #ccc;margin-top:1em}
.row{display:flex;gap:1em;flex-wrap:wrap}</style></head><body>
<h2>Matryoshka Diffusion — TPU demo</h2>
<form id=f>
<label>Config <select name=config id=cfgsel></select>
Checkpoint <select name=model_file id=ckptsel><option value="">(random init)
</option></select></label>
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
<label><input type=checkbox name=stream value=1 checked>
Show diffusion progress (streamed previews)
<input type=checkbox name=show_xt value=1> Show predicted x_t
<input type=checkbox name=output_inner value=1> Output inner UNet
<input type=checkbox name=save_path value=1> Diffusion-path animation</label>
<button type=submit>Generate</button></form>
<div id=status></div>
<div class=row><div><h4>Output</h4><img id=out></div>
<div><h4>Noise schedule (logSNR)</h4><img id=snr style=width:400px></div>
<div><h4>Diffusion path</h4><img id=vid></div></div>
<script>
async function loadChoices(){
  const j = await (await fetch('/choices')).json();
  for (const [id, xs] of [['cfgsel', j.configs], ['ckptsel', j.checkpoints]]){
    const s = document.getElementById(id);
    for (const x of xs){const o=document.createElement('option');
      o.value=x;o.innerText=x;s.appendChild(o);}
  }
}
loadChoices();
document.getElementById('f').onsubmit = async (e) => {
  e.preventDefault();
  const q = new URLSearchParams(new FormData(e.target));
  const st = document.getElementById('status');
  st.innerText = 'sampling...';
  const r = await fetch('/generate?' + q);
  if (r.headers.get('Content-Type').startsWith('text/event-stream')) {
    const rd = r.body.getReader(); const dec = new TextDecoder();
    let buf = '';
    for (;;) {
      const {done, value} = await rd.read(); if (done) break;
      buf += dec.decode(value, {stream: true});
      let i;
      while ((i = buf.indexOf('\\n\\n')) >= 0) {
        const chunk = buf.slice(0, i); buf = buf.slice(i + 2);
        if (!chunk.startsWith('data: ')) continue;
        const j = JSON.parse(chunk.slice(6));
        if (j.image) document.getElementById('out').src =
            'data:image/png;base64,' + j.image;
        if (j.logsnr_plot) document.getElementById('snr').src =
            'data:image/png;base64,' + j.logsnr_plot;
        if (j.video) document.getElementById('vid').src =
            'data:' + j.video_mime + ';base64,' + j.video;
        st.innerText = j.text || JSON.stringify(j.info || {});
      }
    }
  } else {
    const j = await r.json();
    document.getElementById('out').src = 'data:image/png;base64,' + j.image;
    if (j.logsnr_plot) document.getElementById('snr').src =
        'data:image/png;base64,' + j.logsnr_plot;
    st.innerText = JSON.stringify(j.info);
  }
};
</script></body></html>"""


def _png_b64_u8(img_u8: np.ndarray) -> str:
    from PIL import Image

    buf = io.BytesIO()
    Image.fromarray(img_u8).save(buf, format="PNG")
    return base64.b64encode(buf.getvalue()).decode()


def make_builtin_server(args, port: Optional[int] = None):
    """Build (don't run) the stdlib HTTP server — separated from
    serve_builtin so tests can drive it on an ephemeral port."""
    from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
    from urllib.parse import parse_qs, urlparse

    default_models = setup_models(args)
    default_key = f"{args.config_path}::{getattr(args, 'model_file', '')}"
    _CACHE[default_key] = default_models

    def models_for(q):
        cfg = q.get("config", "") or args.config_path
        ckpt = q.get("model_file", "") or None
        if cfg == args.config_path and not ckpt:
            return default_models
        return get_cached_models(cfg, ckpt)

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
            if url.path == "/choices":
                configs, ckpts = list_demo_choices(args)
                self.send_response(200)
                self.send_header("Content-Type", "application/json")
                self.end_headers()
                self.wfile.write(json.dumps(
                    {"configs": configs, "checkpoints": ckpts}
                ).encode())
                return
            if url.path == "/generate":
                q = {k: v[0] for k, v in parse_qs(url.query).items()}
                try:
                    self._generate(q)
                except BrokenPipeError:
                    pass
                return
            self.send_response(404)
            self.end_headers()

        def _generate(self, q):
            models = models_for(q)
            kw = dict(
                negative_prompt=q.get("negative_prompt", ""),
                style=q.get("style", "none"),
                batch_size=int(q.get("batch_size", 4)),
                guidance_scale=float(q.get("guidance_scale", 7.5)),
                threshold_function=q.get("threshold_function", "CLIP"),
                num_inference_steps=int(q.get("num_inference_steps", 50)),
                ddim_eta=float(q.get("ddim_eta", 0)),
                seed=int(q.get("seed", 0)),
                show_xt=bool(q.get("show_xt")),
                output_inner=bool(q.get("output_inner")),
                save_diffusion_path=bool(q.get("save_path")),
            )
            prompt = q.get("prompt", "")
            if not q.get("stream"):
                events = list(run_demo(models, prompt, **kw))
                fin = events[-1]
                body = {
                    "image": _png_b64_u8(fin["image"]),
                    "info": fin.get("info", {}),
                }
                if fin.get("logsnr_plot") is not None:
                    body["logsnr_plot"] = _png_b64_u8(fin["logsnr_plot"])
                raw = json.dumps(body).encode()
                self.send_response(200)
                self.send_header("Content-Type", "application/json")
                self.end_headers()
                self.wfile.write(raw)
                return
            # Server-sent events: one `data:` frame per preview + a final
            self.send_response(200)
            self.send_header("Content-Type", "text/event-stream")
            self.send_header("Cache-Control", "no-cache")
            self.end_headers()
            for ev in run_demo(
                models, prompt, show_diffusion_path=True, **kw
            ):
                out = {"kind": ev["kind"], "text": ev.get("text", "")}
                if ev.get("image") is not None:
                    out["image"] = _png_b64_u8(ev["image"])
                if ev["kind"] == "preview":
                    out["step"] = ev["step"]
                    out["total"] = ev["total"]
                else:
                    out["info"] = ev.get("info", {})
                    if ev.get("logsnr_plot") is not None:
                        out["logsnr_plot"] = _png_b64_u8(ev["logsnr_plot"])
                    vp = ev.get("video_path")
                    if vp and os.path.exists(vp):
                        with open(vp, "rb") as f:
                            out["video"] = base64.b64encode(
                                f.read()
                            ).decode()
                        out["video_mime"] = (
                            "video/mp4" if vp.endswith(".mp4")
                            else "image/gif"
                        )
                self.wfile.write(
                    b"data: " + json.dumps(out).encode() + b"\n\n"
                )
                self.wfile.flush()

    server = ThreadingHTTPServer(
        ("0.0.0.0", args.port if port is None else port), Handler
    )
    return server


def serve_builtin(args):
    server = make_builtin_server(args)
    logging.info(f"builtin demo UI on http://0.0.0.0:{server.server_port}")
    server.serve_forever()


def build_gradio_app(args):
    """Build (but do not launch) the gradio Blocks UI with the reference
    demo's surface (generate_sample.py:318-560): config/checkpoint
    dropdowns, streamed per-step previews, logSNR pane, diffusion-path
    video, show-x_t / output-inner toggles, run/stop buttons.

    Returns (demo, run): the Blocks app and the generator callback wired
    to the Run button — exposed separately so tests can drive the yield-
    per-preview protocol (the part gradio is picky about, reference
    generate_sample.py:318-560) without a server."""
    import gradio as gr

    # warm the default model so the first request doesn't pay setup
    get_cached_models(args.config_path, getattr(args, "model_file", None))
    configs, ckpts = list_demo_choices(args)

    def run(config, ckpt, prompt, negative, style, batch, guidance, thresh,
            steps, eta, seed, show_path, save_path, show_xt, output_inner):
        models = get_cached_models(config, ckpt or None)
        final_img, snr_img, video = None, None, None
        for ev in run_demo(
            models, prompt, negative_prompt=negative, style=style,
            batch_size=int(batch), guidance_scale=float(guidance),
            threshold_function=thresh, num_inference_steps=int(steps),
            ddim_eta=float(eta), seed=int(seed),
            save_diffusion_path=bool(save_path),
            show_diffusion_path=bool(show_path),
            show_xt=bool(show_xt), output_inner=bool(output_inner),
        ):
            if ev["kind"] == "preview":
                yield ev["image"], None, ev["text"], None
            else:
                final_img = ev["image"]
                snr_img = ev.get("logsnr_plot")
                video = ev.get("video_path")
                yield final_img, snr_img, ev["text"], video

    with gr.Blocks(title="Matryoshka Diffusion — TPU demo") as demo:
        gr.Markdown("# Matryoshka Diffusion — TPU demo")
        with gr.Row():
            config_dd = gr.Dropdown(
                configs, value=args.config_path, label="Config",
                allow_custom_value=True,
            )
            ckpt_dd = gr.Dropdown(
                [""] + ckpts, value=getattr(args, "model_file", "") or "",
                label="Checkpoint", allow_custom_value=True,
            )
        with gr.Row():
            prompt_tb = gr.Textbox(label="Prompt")
            negative_tb = gr.Textbox(label="Negative prompt")
        with gr.Row():
            style_dd = gr.Dropdown(
                list(STYLE_TEMPLATES), value="none", label="Style"
            )
            batch_sl = gr.Slider(1, 128, value=4, step=1, label="Batch")
            guidance_sl = gr.Slider(0, 50, value=7.5, label="Guidance")
            thresh_dd = gr.Dropdown(
                ["CLIP", "DYNAMIC", "DYNAMIC_IF", "NONE"], value="CLIP",
                label="Threshold",
            )
        with gr.Row():
            steps_sl = gr.Slider(1, 1000, value=50, step=1, label="Steps")
            eta_sl = gr.Slider(0, 1, value=0.0, step=0.05, label="DDIM eta")
            seed_nb = gr.Number(value=137, label="Seed", precision=0)
        with gr.Row():
            show_path_cb = gr.Checkbox(
                value=False, label="Show diffusion progress"
            )
            save_path_cb = gr.Checkbox(
                value=True, label="Show diffusion path as a video"
            )
            show_xt_cb = gr.Checkbox(value=False, label="Show predicted x_t")
            inner_cb = gr.Checkbox(
                value=False, label="Output inner UNet (high-res models only)"
            )
        run_btn = gr.Button(value="Run", variant="primary")
        stop_btn = gr.Button(value="Stop", variant="stop")
        with gr.Row():
            out_img = gr.Image(label="Output image")
            out_video = gr.Video(label="Diffusion path")
        with gr.Row():
            out_text = gr.Textbox(label="System output")
            snr_img = gr.Image(label="Noise schedule (logSNR)")
        run_event = run_btn.click(
            fn=run,
            inputs=[config_dd, ckpt_dd, prompt_tb, negative_tb, style_dd,
                    batch_sl, guidance_sl, thresh_dd, steps_sl, eta_sl,
                    seed_nb, show_path_cb, save_path_cb, show_xt_cb,
                    inner_cb],
            outputs=[out_img, snr_img, out_text, out_video],
        )
        stop_btn.click(fn=None, cancels=[run_event], queue=False)
    return demo, run


def serve_gradio(args):
    demo, _ = build_gradio_app(args)
    demo.queue(default_concurrency_limit=1).launch(
        server_name="0.0.0.0", server_port=args.port
    )


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
