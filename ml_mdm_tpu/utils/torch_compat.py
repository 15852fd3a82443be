"""torch .pth checkpoint <-> JAX pytree conversion.

North-star requirement (SURVEY.md §2 "Checkpoint format"): the released
flickr64/256/1024 ``vis_model.pth`` checkpoints must load unchanged.

Checkpoint shape (reference unet.py:794-832, train_parallel.py:282-293):
    {"state_dict": <torch state dict>, "batch_num": int, ..., "args": ...}

Mapping is mechanical because our flax modules mirror torch names:
    torch ``down_blocks.0.resnets.1.conv1.weight``
    flax  ``down_blocks_0 / resnets_1 / conv1 / kernel``

Rules:
- dotted integer components merge into the previous name (ModuleList);
- ``cond_layers.<key>.<idx>`` merges fully (ModuleDict of ModuleList);
- layout transposes are driven by the *destination* shapes in a params
  template: conv OIHW->HWIO, linear (out,in)->(in,out), 1x1-conv->Dense
  squeeze, norm weight->scale;
- loads are non-strict with both-side diffs reported, matching the
  reference's filtered load (unet.py:806-826).
"""
from __future__ import annotations

import logging
from typing import Any, Dict, List, Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp

# historical layouts where GroupNormF32/LayerNormF32 nested a flax norm
# submodule; current modules own scale/bias directly. Kept so param
# trees saved by older revisions still convert.
_WRAPPED_NORMS = ("GroupNorm_0", "LayerNorm_0")


def _torch_key_to_path(key: str) -> List[str]:
    parts = key.split(".")
    merged: List[str] = []
    i = 0
    while i < len(parts):
        p = parts[i]
        if p == "cond_layers" and i + 2 < len(parts):
            merged.append(f"{p}_{parts[i+1]}_{parts[i+2]}")
            i += 3
            continue
        if merged and p.isdigit():
            merged[-1] = f"{merged[-1]}_{p}"
        else:
            merged.append(p)
        i += 1
    return merged


def _flatten(tree, prefix=()) -> Dict[Tuple[str, ...], Any]:
    out = {}
    if isinstance(tree, dict):
        for k, v in tree.items():
            out.update(_flatten(v, prefix + (k,)))
    else:
        out[prefix] = tree
    return out


def _unflatten(flat: Dict[Tuple[str, ...], Any]):
    tree: Dict[str, Any] = {}
    for path, value in flat.items():
        node = tree
        for p in path[:-1]:
            node = node.setdefault(p, {})
        node[path[-1]] = value
    return tree


def _resolve_path(
    template: Dict[Tuple[str, ...], Any], parts: List[str], leaf: str
) -> Optional[Tuple[str, ...]]:
    """Map torch (parts, leaf) onto an existing template path, descending
    into single-child norm wrappers (GroupNormF32 -> GroupNorm_0)."""
    base = tuple(parts)
    leaf_names = (
        ["kernel", "scale", "embedding"] if leaf == "weight" else [leaf]
    )
    for wrap in [(), None]:
        for ln in leaf_names:
            for extra in ([], list(_WRAPPED_NORMS)):
                if not extra:
                    cand = base + (ln,)
                    if cand in template:
                        return cand
                else:
                    for w in extra:
                        cand = base + (w, ln)
                        if cand in template:
                            return cand
        break
    return None


def _adapt_tensor(
    src: np.ndarray, dst_shape: Tuple[int, ...], leaf: str
) -> np.ndarray:
    """Layout-convert a torch tensor to the flax destination. The transform
    is decided by the destination kind (NOT by shape matching — square
    dense kernels still need the transpose)."""
    s = np.asarray(src)
    if leaf == "kernel":
        if len(dst_shape) == 4 and s.ndim == 4:
            t = s.transpose(2, 3, 1, 0)  # conv OIHW -> HWIO
        elif len(dst_shape) == 3 and s.ndim == 3:
            t = s.transpose(2, 1, 0)  # conv1d OIK -> KIO (temporal resample)
        elif len(dst_shape) == 2 and s.ndim == 4:
            t = s[:, :, 0, 0].transpose(1, 0)  # 1x1 conv -> dense
        elif len(dst_shape) == 2 and s.ndim == 2:
            t = s.transpose(1, 0)  # (out,in) -> (in,out)
        else:
            t = s
    else:  # scale / bias / embedding
        t = s
    if tuple(t.shape) != tuple(dst_shape):
        raise ValueError(
            f"cannot adapt {s.shape} -> {dst_shape} (leaf={leaf})"
        )
    return t


def torch_state_dict_to_params(
    state_dict: Dict[str, Any], params_template
) -> Tuple[Any, List[str], List[str]]:
    """Convert a torch state dict into a flax params pytree shaped like
    ``params_template``. Returns (params, unmatched_torch, unfilled_flax)."""
    template = _flatten(params_template)
    out: Dict[Tuple[str, ...], Any] = {}
    unmatched: List[str] = []
    for key, value in state_dict.items():
        value = np.asarray(
            value.detach().cpu().numpy() if hasattr(value, "detach") else value
        )
        parts = _torch_key_to_path(key)
        leaf = parts[-1]
        path = _resolve_path(template, parts[:-1], leaf)
        if path is None:
            unmatched.append(key)
            continue
        dst = template[path]
        try:
            out[path] = jnp.asarray(
                _adapt_tensor(value, tuple(dst.shape), path[-1]),
                dtype=dst.dtype,
            )
        except ValueError:
            unmatched.append(key)
    unfilled = []
    for path, leafval in template.items():
        if path not in out:
            unfilled.append("/".join(path))
            out[path] = leafval
    if unmatched or unfilled:
        logging.warning(
            f"torch->flax: {len(unmatched)} unmatched torch keys, "
            f"{len(unfilled)} unfilled flax leaves"
        )
    return _unflatten(out), unmatched, unfilled


import re as _re

# Dense layers that are 1x1 Conv2d in the torch reference 2-D attention
# (unet.py:260,265,269-271). kv_cond is an nn.Linear there (unet.py:264).
_ATTN2D_DENSE = {"qkv", "proj_out", "ffn_1", "ffn_3"}


def params_to_torch_state_dict(params) -> Dict[str, np.ndarray]:
    """Inverse conversion (for exporting .pth the reference can load).

    Dense kernels inside 2-D SelfAttention blocks (flax path component
    ``attn_<i>``) were 1x1 Conv2d in torch — re-expanded to 4-D."""
    flat = _flatten(params)
    out: Dict[str, np.ndarray] = {}
    for path, value in flat.items():
        parts = [p for p in path if p not in _WRAPPED_NORMS]
        leaf = parts[-1]
        in_2d_attn = any(_re.fullmatch(r"attn_\d+", p) for p in parts)
        comps: List[str] = []
        for p in parts[:-1]:
            if p.startswith("cond_layers_"):
                rest = p[len("cond_layers_"):]
                key, idx = rest.rsplit("_", 1)
                comps.extend(["cond_layers", key, idx])
                continue
            head, _, tail = p.rpartition("_")
            if tail.isdigit() and head:
                comps.extend([head, tail])
            else:
                comps.append(p)
        v = np.asarray(value)
        if leaf == "kernel":
            name = "weight"
            if v.ndim == 4:
                v = v.transpose(3, 2, 0, 1)
            elif v.ndim == 3:
                v = v.transpose(2, 1, 0)  # KIO -> conv1d OIK
            else:
                v = v.transpose(1, 0)
                if in_2d_attn and parts[-2] in _ATTN2D_DENSE:
                    v = v[:, :, None, None]  # dense -> 1x1 conv OIHW
        elif leaf == "scale":
            name = "weight"
        else:
            name = leaf
        out[".".join(comps + [name])] = v
    return out


class _DummyPickled:
    """Placeholder for classes that no longer import (old checkpoints
    pickle argparse Namespaces holding reference dataclasses/enums —
    the reference needed fix_old_checkpoints.mimic_old_modules for
    this; tolerating *any* missing class is strictly more robust)."""

    def __init__(self, *a, **k):
        pass

    def __setstate__(self, state):
        if isinstance(state, dict):
            self.__dict__.update(state)


def _tolerant_pickle_module():
    import pickle
    import types

    class Unpickler(pickle.Unpickler):
        def find_class(self, module, name):
            try:
                return super().find_class(module, name)
            except (ImportError, AttributeError):
                logging.debug(
                    f"checkpoint references missing {module}.{name}; "
                    "substituting placeholder"
                )
                return type(name, (_DummyPickled,), {})

    import io

    mod = types.ModuleType("ml_mdm_tpu_tolerant_pickle")
    mod.Unpickler = Unpickler
    mod.load = lambda f, **kw: Unpickler(f, **kw).load()
    # loads must be tolerant too: some torch versions unpickle payload
    # bytes through pickle_module.loads rather than Unpickler/load
    mod.loads = lambda data, **kw: Unpickler(
        io.BytesIO(data), **kw
    ).load()
    return mod


def load_torch_checkpoint(
    fname: str, params_template
) -> Tuple[Any, Dict[str, Any]]:
    """Load a reference .pth file into flax params. Returns
    (params, other_items) like the reference .load()."""
    import torch

    checkpoint = torch.load(
        fname, map_location="cpu", weights_only=False,
        pickle_module=_tolerant_pickle_module(),
    )
    state_dict = checkpoint.get("state_dict", checkpoint)
    params, unmatched, unfilled = torch_state_dict_to_params(
        state_dict, params_template
    )
    if unmatched or unfilled:
        print(set(unmatched), set(unfilled))
    other = {k: v for k, v in checkpoint.items() if k != "state_dict"}
    return params, other


def save_torch_checkpoint(fname: str, params, other_items=None):
    import torch

    sd = {
        k: torch.from_numpy(np.asarray(v).copy())
        for k, v in params_to_torch_state_dict(params).items()
    }
    checkpoint = {"state_dict": sd}
    if other_items:
        checkpoint.update(other_items)
    torch.save(checkpoint, fname)
