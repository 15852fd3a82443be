"""Checkpoint save/load.

Two formats:
- **Native**: Orbax (async-capable, sharding-aware) — the TPU-first path.
- **Reference-compatible**: torch ``.pth`` files with the exact reference
  payload shape (state_dict + batch_num/loss/exp_avg_loss/... —
  train_parallel.py:282-293), via utils/torch_compat. ``load_vision_model``
  sniffs the format, so ``--pretrained-vision-file vis_model.pth`` works
  with released reference checkpoints unchanged.
"""
from __future__ import annotations

import json
import logging
import os
from typing import Any, Dict, Optional, Tuple

import numpy as np

import jax

from ml_mdm_tpu.utils import torch_compat


def _is_torch_checkpoint(path: str) -> bool:
    if os.path.isdir(path):
        return False
    with open(path, "rb") as f:
        magic = f.read(8)
    # zip (new torch) or legacy pickle magic
    return magic[:4] in (b"PK\x03\x04", b"\x80\x02\x80\x05") or magic[
        :2
    ] == b"\x80"


def save_vision_model(
    path: str,
    params,
    other_items: Optional[Dict[str, Any]] = None,
    format: str = "auto",
):
    """Save vision params. ``.pth`` suffix (or format='torch') writes a
    reference-compatible torch checkpoint; otherwise Orbax."""
    if format == "torch" or (format == "auto" and path.endswith(".pth")):
        logging.info(f"Saving torch-compatible model file: {path}")
        torch_compat.save_torch_checkpoint(path, params, other_items)
        return
    logging.info(f"Saving orbax checkpoint: {path}")
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    ckptr = ocp.PyTreeCheckpointer()
    ckptr.save(path, {"params": params}, force=True)
    if other_items:
        with open(os.path.join(path, "train_meta.json"), "w") as f:
            json.dump(_jsonable(other_items), f)


def load_vision_model(
    path: str, params_template
) -> Tuple[Any, Dict[str, Any]]:
    """Load vision params from .pth (reference) or Orbax dir. Non-strict:
    key diffs are reported, intersecting keys loaded (unet.py:806-826)."""
    if os.path.isdir(path):
        import orbax.checkpoint as ocp

        ckptr = ocp.PyTreeCheckpointer()
        restored = ckptr.restore(
            os.path.abspath(path), item={"params": params_template}
        )
        other: Dict[str, Any] = {}
        meta = os.path.join(path, "train_meta.json")
        if os.path.exists(meta):
            with open(meta) as f:
                other = json.load(f)
        return restored["params"], other
    logging.info(f"Loading torch checkpoint: {path}")
    return torch_compat.load_torch_checkpoint(path, params_template)


def _resolve_pretrained_path(path: str) -> str:
    """Resolve a warm-start checkpoint reference to a local file.

    Mirrors the reference's ``download()`` (nested_unet.py:78-93): s3
    paths are fetched once by process 0 (barrier'd), local paths are
    used as-is. Missing files are a hard error — the reference
    swallowed load failures, which made ``initialize_inner_with_
    pretrained`` silently train from scratch."""
    if path.startswith("s3://") or (
        "/" in path and not os.path.exists(path) and not path.startswith((".", "/"))
    ):
        from ml_mdm_tpu import s3_helpers
        from ml_mdm_tpu.distributed import barrier

        local_file = path.replace("s3://", "").replace("/", "_")
        if jax.process_index() == 0 and not os.path.exists(local_file):
            s3_helpers.download_object_from_full_path(
                path, download_path=local_file
            )
        barrier("inner_warm_start_download")
        path = local_file
    if not os.path.exists(path):
        raise FileNotFoundError(
            f"initialize_inner_with_pretrained: checkpoint {path!r} not "
            "found (set the field to a local .pth/Orbax path or an s3:// "
            "url, or remove it to train the inner UNet from scratch)"
        )
    return path


def apply_inner_warm_start(params, unet_config):
    """Warm-start inner-UNet subtrees from pretrained checkpoints.

    The Matryoshka progressive recipe (reference nested_unet.py:147-152)
    trains 64px first, then builds the 256px nested model with its inner
    UNet initialized from the 64px checkpoint (and so on for 1024px).
    Walks the nested config; wherever ``initialize_inner_with_pretrained``
    is set, loads that checkpoint (.pth or Orbax, non-strict) into the
    corresponding ``inner_unet`` params subtree. Returns updated params.
    """
    cfg = unet_config
    key_path = []
    while cfg is not None and hasattr(cfg, "inner_config"):
        pretrained = getattr(cfg, "initialize_inner_with_pretrained", None)
        key_path.append("inner_unet")
        if pretrained:
            local = _resolve_pretrained_path(str(pretrained))
            subtree = params
            for k in key_path:
                subtree = subtree[k]
            logging.info(
                f"Warm-starting {'/'.join(key_path)} from {local}"
            )
            new_subtree, _ = load_vision_model(local, subtree)
            params = _set_in(params, key_path, new_subtree)
        cfg = getattr(cfg, "inner_config", None)
    return params


def _set_in(tree, key_path, value):
    """Copy-on-write set of tree[k0][k1]... = value for dict pytrees."""
    if not key_path:
        return value
    out = dict(tree)
    out[key_path[0]] = _set_in(tree[key_path[0]], key_path[1:], value)
    return out


def select_resume_checkpoint(path: str, resume_from_ema: bool) -> str:
    """Honor --resume-from-ema (reference config.py:172-176, a defined
    but never-consumed flag there): our trainer writes dual checkpoints
    ``vis_model_{N}.pth`` (EMA) and ``vis_model_noema_{N}.pth`` (raw).
    With the flag set, a raw path is redirected to its EMA sibling."""
    if not resume_from_ema:
        return path
    base = os.path.basename(path)
    if "noema_" not in base:
        return path  # already the EMA file by naming convention
    sibling = os.path.join(
        os.path.dirname(path), base.replace("noema_", "")
    )
    if os.path.exists(sibling):
        logging.info(
            f"--resume-from-ema: loading {sibling} instead of {path}"
        )
        return sibling
    logging.warning(
        f"--resume-from-ema set but EMA sibling {sibling} not found; "
        f"loading {path}"
    )
    return path


def _jsonable(d):
    out = {}
    for k, v in d.items():
        if isinstance(v, (int, float, str, bool, type(None))):
            out[k] = v
        elif isinstance(v, (np.integer, np.floating)):
            out[k] = v.item()
        elif hasattr(v, "item") and getattr(v, "ndim", 1) == 0:
            out[k] = v.item()
        else:
            out[k] = str(v)
    return out


def save_train_state(path: str, state, other_items=None,
                     write_meta: bool = True):
    """Full training state (params+ema+opt) via Orbax for exact resume.

    In a multi-process run every process must call this (Orbax's save
    syncs all processes internally); pass ``write_meta`` False on
    non-primary ranks so the JSON sidecar is written once."""
    import orbax.checkpoint as ocp

    ckptr = ocp.PyTreeCheckpointer()
    ckptr.save(
        os.path.abspath(path),
        {
            "step": state.step,
            "params": state.params,
            "ema_params": state.ema_params,
            "opt_state": state.opt_state,
        },
        force=True,
    )
    if other_items and write_meta:
        with open(os.path.join(path, "train_meta.json"), "w") as f:
            json.dump(_jsonable(other_items), f)


def load_train_state(path: str, state):
    import orbax.checkpoint as ocp

    ckptr = ocp.PyTreeCheckpointer()
    restored = ckptr.restore(
        os.path.abspath(path),
        item={
            "step": state.step,
            "params": state.params,
            "ema_params": state.ema_params,
            "opt_state": state.opt_state,
        },
    )
    other = {}
    meta = os.path.join(path, "train_meta.json")
    if os.path.exists(meta):
        with open(meta) as f:
            other = json.load(f)
    return (
        state.replace(
            step=restored["step"],
            params=restored["params"],
            ema_params=restored["ema_params"],
            opt_state=restored["opt_state"],
        ),
        other,
    )
