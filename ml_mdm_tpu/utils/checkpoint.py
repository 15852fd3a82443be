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


def save_train_state(path: str, state, other_items=None):
    """Full training state (params+ema+opt) via Orbax for exact resume."""
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
    if other_items:
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
