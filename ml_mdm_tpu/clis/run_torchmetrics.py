"""FID + CLIPScore evaluation CLI (reference run_torchmetrics.py).

Protocol parity: polls ``{sample_dir}/rank*/lst.json`` manifests written by
generate_batch (run_torchmetrics.py:52-59), computes a reference-vs-
reference sanity FID, then sample FID and CLIPScore over >= min-examples
images.

Implementation: the Frechet distance and feature pipelines are implemented
here (torchmetrics isn't a dependency); feature extractors are pluggable:

- ``inception``: torchvision/torchmetrics InceptionV3 when installed
  (weights need network — unavailable in zero-egress sandboxes);
- ``clip``: HF CLIP vision tower (``openai/clip-vit-base-patch16`` or a
  local path) — also used for CLIPScore;
- ``pixel``: weight-free downsampled-pixel+statistics features, always
  available (sanity runs and hermetic tests).
"""
from __future__ import annotations

import argparse
import glob
import json
import logging
import os
import time
from typing import Dict, List, Tuple

import numpy as np


# ---------------------------------------------------------------------------
# Frechet distance
# ---------------------------------------------------------------------------


def compute_statistics(feats: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    mu = feats.mean(axis=0)
    sigma = np.cov(feats, rowvar=False)
    return mu, np.atleast_2d(sigma)


def frechet_distance(mu1, sigma1, mu2, sigma2, eps=1e-6) -> float:
    """FID between two Gaussians (Heusel et al. 2017)."""
    from scipy import linalg

    def _sqrtm(m):  # scipy >= 1.14 drops the disp kwarg/tuple return
        out = linalg.sqrtm(m)
        return out[0] if isinstance(out, tuple) else out

    diff = mu1 - mu2
    covmean = _sqrtm(sigma1 @ sigma2)
    if not np.isfinite(covmean).all():
        offset = np.eye(sigma1.shape[0]) * eps
        covmean = _sqrtm((sigma1 + offset) @ (sigma2 + offset))
    if np.iscomplexobj(covmean):
        covmean = covmean.real
    return float(
        diff @ diff + np.trace(sigma1) + np.trace(sigma2)
        - 2 * np.trace(covmean)
    )


def fid_from_features(feats_a: np.ndarray, feats_b: np.ndarray) -> float:
    mu1, s1 = compute_statistics(feats_a)
    mu2, s2 = compute_statistics(feats_b)
    return frechet_distance(mu1, s1, mu2, s2)


# ---------------------------------------------------------------------------
# feature extractors
# ---------------------------------------------------------------------------


class PixelFeatures:
    """Weight-free features: 8x8x3 downsample + channel moments. Not a
    perceptual metric — a deterministic always-available fallback."""

    name = "pixel"

    def __call__(self, images_u8: np.ndarray) -> np.ndarray:
        from PIL import Image

        feats = []
        for img in images_u8:
            small = np.asarray(
                Image.fromarray(img).resize((8, 8), Image.BILINEAR),
                dtype=np.float32,
            ) / 255.0
            moments = np.concatenate(
                [
                    img.reshape(-1, 3).mean(0) / 255.0,
                    img.reshape(-1, 3).std(0) / 255.0,
                ]
            )
            feats.append(np.concatenate([small.ravel(), moments]))
        return np.asarray(feats)


class InceptionFeatures:
    name = "inception"

    def __init__(self, feature_layer: int = 2048):
        import torch
        from torchvision.models import inception_v3  # may be absent

        self.torch = torch
        self.model = inception_v3(weights="DEFAULT", aux_logits=True)
        self.model.fc = torch.nn.Identity()
        self.model.eval()
        self.feature_layer = feature_layer

    def __call__(self, images_u8: np.ndarray) -> np.ndarray:
        import torch
        from PIL import Image

        batch = []
        for img in images_u8:
            im = Image.fromarray(img).resize((299, 299), Image.BILINEAR)
            batch.append(np.asarray(im, dtype=np.float32) / 255.0)
        x = torch.from_numpy(
            np.stack(batch).transpose(0, 3, 1, 2)
        )
        x = (x - 0.5) / 0.5
        with torch.no_grad():
            return self.model(x).numpy()


class ClipFeatures:
    name = "clip"

    def __init__(self, model_name: str = "openai/clip-vit-base-patch16"):
        import torch
        from transformers import CLIPModel, CLIPProcessor

        self.torch = torch
        self.model = CLIPModel.from_pretrained(model_name).eval()
        self.processor = CLIPProcessor.from_pretrained(model_name)

    def __call__(self, images_u8: np.ndarray) -> np.ndarray:
        import torch

        with torch.no_grad():
            inputs = self.processor(
                images=[img for img in images_u8], return_tensors="pt"
            )
            return self.model.get_image_features(**inputs).numpy()

    def clip_score(self, images_u8: np.ndarray, texts: List[str]) -> float:
        """mean(100 * max(0, cos(image, text))) — the torchmetrics
        CLIPScore definition the reference uses."""
        import torch

        with torch.no_grad():
            inputs = self.processor(
                text=texts,
                images=[img for img in images_u8],
                return_tensors="pt",
                padding=True,
                truncation=True,
            )
            out = self.model(**inputs)
            img = out.image_embeds / out.image_embeds.norm(dim=-1,
                                                           keepdim=True)
            txt = out.text_embeds / out.text_embeds.norm(dim=-1,
                                                         keepdim=True)
            cos = (img * txt).sum(-1)
            return float((100 * cos.clamp(min=0)).mean())


def build_extractor(kind: str, clip_model: str, feature_layer: int):
    if kind == "pixel":
        return PixelFeatures()
    if kind == "inception":
        return InceptionFeatures(feature_layer)
    if kind == "clip":
        return ClipFeatures(clip_model)
    raise ValueError(f"unknown feature extractor {kind}")


# ---------------------------------------------------------------------------
# manifest polling + image loading
# ---------------------------------------------------------------------------


def wait_for_manifests(sample_dir: str, timeout: float = 36000.0,
                       poll: float = 10.0) -> List[str]:
    """Poll for rank*/lst.json files (reference behaviour)."""
    deadline = time.time() + timeout
    while True:
        manifests = sorted(glob.glob(os.path.join(sample_dir, "rank*",
                                                  "lst.json")))
        if manifests:
            return manifests
        if time.time() > deadline:
            raise TimeoutError(f"no manifests under {sample_dir}")
        time.sleep(poll)


def load_images(sample_dir: str, prefix: str, limit: int):
    """Load (images, captions) from rank manifests. ``prefix`` selects
    sample ('s_') or reference ('ref_') images."""
    from PIL import Image

    images, captions = [], []
    for manifest in wait_for_manifests(sample_dir, timeout=0.1, poll=0.1):
        rank_dir = os.path.dirname(manifest)
        with open(manifest) as f:
            entries = json.load(f)
        for fname, caption in sorted(entries.items()):
            path = os.path.join(
                rank_dir,
                fname if prefix == "s_" else fname.replace("s_", prefix),
            )
            if not os.path.exists(path):
                continue
            images.append(np.asarray(Image.open(path).convert("RGB")))
            captions.append(caption)
            if len(images) >= limit:
                return np.stack(images), captions
    if not images:
        raise FileNotFoundError(f"no {prefix}* images under {sample_dir}")
    return np.stack(images), captions


def main(argv=None):
    p = argparse.ArgumentParser(description="FID / CLIP evaluation")
    p.add_argument("--sample-dir", type=str, default="samples")
    p.add_argument("--min-examples", type=int, default=10000)
    p.add_argument("--metrics", type=str, default="fid,clip")
    p.add_argument(
        "--feature-extractor", type=str, default="inception",
        choices=["inception", "clip", "pixel"],
    )
    p.add_argument("--feature-layer", type=int, default=2048,
                   choices=[64, 192, 768, 2048])
    p.add_argument("--clip-model", type=str,
                   default="openai/clip-vit-base-patch16")
    p.add_argument("--output-json", type=str, default=None)
    args = p.parse_args(argv)

    metrics = args.metrics.split(",")
    results: Dict[str, float] = {}

    refs, ref_caps = load_images(args.sample_dir, "ref_", args.min_examples)
    samples, caps = load_images(args.sample_dir, "s_", args.min_examples)
    logging.info(f"{len(refs)} reference / {len(samples)} sample images")

    if "fid" in metrics:
        try:
            extractor = build_extractor(
                args.feature_extractor, args.clip_model, args.feature_layer
            )
        except Exception as e:
            logging.warning(
                f"{args.feature_extractor} extractor unavailable ({e}); "
                "falling back to weight-free pixel features"
            )
            extractor = PixelFeatures()
        ref_feats = extractor(refs)
        # sanity: two halves of the reference set should be near 0
        half = len(ref_feats) // 2
        if half > ref_feats.shape[1]:
            sanity = fid_from_features(ref_feats[:half], ref_feats[half:])
            logging.info(f"reference-vs-reference FID: {sanity:.4f}")
            results["fid_sanity"] = sanity
        results["fid"] = fid_from_features(extractor(samples), ref_feats)
        results["fid_extractor"] = extractor.name
        logging.info(f"FID: {results['fid']:.4f}")

    if "clip" in metrics:
        try:
            clip = ClipFeatures(args.clip_model)
            results["clip_score"] = clip.clip_score(samples, caps)
            logging.info(f"CLIPScore: {results['clip_score']:.4f}")
        except Exception as e:
            logging.warning(f"CLIP unavailable: {e}")

    if args.output_json:
        with open(args.output_json, "w") as f:
            json.dump(results, f)
    print(json.dumps(results))
    return results


if __name__ == "__main__":
    logging.basicConfig(level="INFO")
    main()
