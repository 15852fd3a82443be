"""Model/pipeline registry + reference-compatible YAML & CLI configuration.

Replaces the reference's simple_parsing-based system
(/root/reference/ml-mdm-matryoshka/ml_mdm/config.py) with a dependency-free
dataclass loader. Shipped reference YAMLs (configs/models/*.yaml) load
unchanged:

- ``--config_path file.yaml`` merges YAML into the argument namespace;
- nested dataclass sections (``unet_config``, ``diffusion_config``,
  ``reader_config``) are instantiated recursively, including the
  ``inner_config`` recursion of nested models;
- dotted CLI overrides (``--reader_config.max_token_length 128``) work;
- unknown YAML keys are tolerated (collected into ``args.extra_config``)
  the way the reference's parse_known_args tolerated them, but they are
  *reported* instead of silently dropped (SURVEY.md quirk #5).
"""
from __future__ import annotations

import argparse
import dataclasses
import logging
from dataclasses import dataclass, fields, is_dataclass
from typing import Any, Dict, List, Optional

import yaml

MODEL_CONFIG_REGISTRY: Dict[str, Dict[str, Any]] = {}
MODEL_REGISTRY: Dict[str, Any] = {}
PIPELINE_CONFIG_REGISTRY: Dict[str, Any] = {}
PIPELINE_REGISTRY: Dict[str, Any] = {}


def register_model_config(*names):
    arch, main = names

    def wrap(cls):
        MODEL_CONFIG_REGISTRY[arch] = {"model": main, "config": cls}
        return cls

    return wrap


def register_model(*names):
    def wrap(cls):
        for name in names:
            MODEL_REGISTRY[name] = cls
        return cls

    return wrap


def register_pipeline_config(*names):
    def wrap(cls):
        for name in names:
            PIPELINE_CONFIG_REGISTRY[name] = cls
        return cls

    return wrap


def register_pipeline(*names):
    def wrap(cls):
        for name in names:
            PIPELINE_REGISTRY[name] = cls
        return cls

    return wrap


def get_model(name):
    if name not in MODEL_CONFIG_REGISTRY:
        raise NotImplementedError(f"unknown model {name!r}")
    return MODEL_REGISTRY[MODEL_CONFIG_REGISTRY[name]["model"]]


def get_model_config_cls(name):
    if name not in MODEL_CONFIG_REGISTRY:
        raise NotImplementedError(f"unknown model {name!r}")
    return MODEL_CONFIG_REGISTRY[name]["config"]


def get_pipeline(name):
    if name not in MODEL_CONFIG_REGISTRY:
        raise NotImplementedError(f"unknown model {name!r}")
    return PIPELINE_REGISTRY[MODEL_CONFIG_REGISTRY[name]["model"]]


def get_pipeline_config_cls(name):
    if name not in MODEL_CONFIG_REGISTRY:
        raise NotImplementedError(f"unknown model {name!r}")
    return PIPELINE_CONFIG_REGISTRY[MODEL_CONFIG_REGISTRY[name]["model"]]


# ---------------------------------------------------------------------------
# inert compatibility fields
# ---------------------------------------------------------------------------

# Fields accepted ONLY so reference YAMLs parse unchanged; they have no
# behavior here (nor in the reference, where they are equally dead —
# SURVEY.md quirk #5). Setting one to a non-default value warns loudly:
# a silently-ignored knob is worse than an error. Every field of every
# registered config dataclass must be either wired or listed here
# (enforced by tests/test_configs.py::test_no_silently_unwired_fields).
INERT_COMPAT_FIELDS: Dict[str, set] = {
    "NestedDiffusionConfig": {
        "use_random_interp", "random_downsample", "average_downsample",
        "mid_downsample",
    },
    "SamplerConfig": {"reproject_signal"},
    "ReaderConfig": {"bucket"},
}


def warn_inert_fields(cfg, _path: str = "") -> List[str]:
    """Warn (and return paths) for inert-compat fields set to non-default
    values anywhere in a (possibly nested) config dataclass."""
    hits: List[str] = []
    if cfg is None or not is_dataclass(cfg) or isinstance(cfg, type):
        return hits
    inert = INERT_COMPAT_FIELDS.get(type(cfg).__name__, set())
    defaults = None
    for f in fields(cfg):
        value = getattr(cfg, f.name)
        where = f"{_path}{type(cfg).__name__}.{f.name}"
        if f.name in inert:
            if defaults is None:
                defaults = type(cfg)()
            if value != getattr(defaults, f.name):
                hits.append(where)
                logging.warning(
                    f"Config field {where}={value!r} is accepted for "
                    "reference-YAML compatibility but has NO effect in "
                    "ml_mdm_tpu (it is equally unused in the reference)."
                )
        hits += warn_inert_fields(value, _path=f"{where}: ")
    return hits


# ---------------------------------------------------------------------------
# dataclass <- dict instantiation (tolerant, recursive)
# ---------------------------------------------------------------------------


def dataclass_from_dict(cls, data: Optional[Dict[str, Any]], extra_sink=None):
    """Build dataclass ``cls`` from a dict, recursing into dataclass fields.

    Unknown keys are recorded in ``extra_sink`` (list) instead of raising,
    mirroring reference parse_known_args tolerance. String "None"/"null"
    map to None (YAMLs contain literal ``None`` strings)."""
    if data is None:
        return cls()
    if isinstance(data, cls):
        return data
    kwargs = {}
    known = {f.name: f for f in fields(cls)}
    for key, value in data.items():
        if key not in known:
            if extra_sink is not None:
                extra_sink.append(f"{cls.__name__}.{key}")
            continue
        f = known[key]
        if isinstance(value, str) and value in ("None", "null"):
            value = None
        ftype = f.type
        # nested dataclass field?
        target = _dataclass_target(cls, f)
        if target is not None and isinstance(value, dict):
            value = dataclass_from_dict(target, value, extra_sink)
        kwargs[key] = value
    return cls(**kwargs)


def _dataclass_target(cls, f):
    """Resolve the dataclass type of a field, if any (handles the
    inner_config recursion where the declared type is a dataclass)."""
    t = f.type
    if isinstance(t, str):
        # evaluate forward reference in the module of cls
        import sys

        mod = sys.modules.get(cls.__module__)
        t = getattr(mod, t, None) if mod else None
        if t is None:
            return None
    if is_dataclass(t):
        return t
    # Optional[Dataclass]
    import typing

    origin = typing.get_origin(t)
    if origin is typing.Union:
        for a in typing.get_args(t):
            if is_dataclass(a):
                return a
    return None


def dataclass_to_dict(obj):
    if is_dataclass(obj) and not isinstance(obj, type):
        return {
            f.name: dataclass_to_dict(getattr(obj, f.name))
            for f in fields(obj)
        }
    if isinstance(obj, (list, tuple)):
        return [dataclass_to_dict(x) for x in obj]
    if isinstance(obj, dict):
        return {k: dataclass_to_dict(v) for k, v in obj.items()}
    if hasattr(obj, "name") and isinstance(obj, object) and obj.__class__.__module__ == "enum":
        return obj.name
    return obj


# ---------------------------------------------------------------------------
# argument parsing (four CLI modes, reference config.py:66-263)
# ---------------------------------------------------------------------------


def _add_common_arguments(p: argparse.ArgumentParser):
    p.add_argument("--loglevel", type=str, default="INFO")
    p.add_argument("--device", type=str, default="tpu")
    p.add_argument("--fp16", type=int, default=0,
                   help="bf16 compute (name kept for YAML compatibility)")
    p.add_argument("--seed", type=int, default=-1)
    p.add_argument("--output-dir", type=str, default="")
    p.add_argument("--vocab_file", type=str, default="data/c4_wpm.vocab")
    p.add_argument("--pretrained-vision-file", type=str, default=None)
    p.add_argument("--categorical-conditioning", type=int, default=0)
    p.add_argument("--text-model", type=str, default="google/flan-t5-xl")
    p.add_argument("--model", "--vision-model", dest="model", type=str,
                   default="unet")
    p.add_argument("--use-precomputed-text-embeddings", type=int, default=0)
    p.add_argument("--batch-size", type=int, default=2)
    p.add_argument("--num-training-steps", type=int, default=850000)
    p.add_argument("--num-epochs", type=int, default=20000)
    return p


def _add_trainer_arguments(p):
    p.add_argument("--multinode", type=int, default=1)
    p.add_argument("--local-rank", type=int, default=0)
    p.add_argument("--use-adamw", action="store_true")
    p.add_argument("--file-list", type=str, default="cifar10-32/train.csv")
    p.add_argument("--log-freq", type=int, default=100)
    p.add_argument("--save-freq", type=int, default=1000)
    p.add_argument("--lr", type=float, default=0.001)
    p.add_argument("--lr-scaling-factor", type=float, default=0.8)
    p.add_argument("--gradient-clip-norm", type=float, default=2.0)
    p.add_argument("--warmup-steps", type=int, default=5000)
    p.add_argument("--num-gradient-accumulations", type=int, default=1)
    p.add_argument("--remat", type=int, default=0,
                   help="rematerialise activations in backward "
                   "(memory for FLOPs; use for 1024px training)")
    p.add_argument("--loss-factor", type=float, default=1)
    p.add_argument("--resume-from-ema", action="store_true")
    p.add_argument("--resume-from-train-state", type=str, default=None,
                   help="orbax train_state_* dir for exact resume "
                   "(params+EMA+optimizer state+step)")
    # TPU-native extensions
    p.add_argument("--mesh-shape", type=str, default=None,
                   help="e.g. 'data:8' or 'data:4,fsdp:2' (default: all "
                        "devices on the data axis)")


def _add_sampler_arguments(p):
    p.add_argument("--model-file", type=str, default="")
    p.add_argument("--test-file-list", type=str, default="")
    p.add_argument("--sample-dir", type=str, default="samples")
    p.add_argument("--eval-freq", type=int, default=1000)
    p.add_argument("--sample-image-size", type=int, default=-1)
    p.add_argument("--port", type=int, default=19231)
    p.add_argument("--min-examples", type=int, default=10000)


def _add_evaluator_arguments(p):
    p.add_argument("--test-file-list", type=str, default="")
    p.add_argument("--sample-dir", type=str, default="samples")
    p.add_argument("--eval-freq", type=int, default=1000)
    p.add_argument("--sample-image-size", type=int, default=-1)
    p.add_argument("--num-eval-batches", type=int, default=500)


def _add_demo_arguments(p):
    p.add_argument("--sample-dir", type=str, default="samples")
    p.add_argument("--sample-image-size", type=int, default=-1)
    p.add_argument("--port", type=int, default=19231)
    p.add_argument("--model-file", type=str, default="")
    # dropdown sources for the served UIs (reference generate_sample.py
    # :338-362 hardcodes 3 config/checkpoint names; we scan directories)
    p.add_argument("--config-dir", type=str, default="configs/models")
    p.add_argument("--model-dir", type=str, default=".")


_MODE_EXTRAS = {
    "trainer": _add_trainer_arguments,
    "sampler": _add_sampler_arguments,
    "evaluator": _add_evaluator_arguments,
    "demo": _add_demo_arguments,
}


def _flatten_yaml_keys(d):
    """YAML may use dashes for CLI-style keys; argparse dests use
    underscores."""
    return {str(k).replace("-", "_"): v for k, v in d.items()}


def get_arguments(args=None, mode="trainer", additional_config_paths=()):
    """Parse CLI + YAML into a namespace with instantiated config
    dataclasses at .unet_config, .diffusion_config, .reader_config."""
    # ensure registries are populated
    from ml_mdm_tpu import diffusion as _d  # noqa: F401
    from ml_mdm_tpu import models as _m  # noqa: F401
    from ml_mdm_tpu.reader import ReaderConfig

    if mode not in _MODE_EXTRAS:
        raise NotImplementedError(mode)

    pre = argparse.ArgumentParser(add_help=False)
    pre.add_argument("--config_path", "--config-path", dest="config_path",
                     type=str, default=None)
    pre.add_argument("--model", "--vision-model", dest="model", type=str,
                     default=None)
    pre.add_argument("--reader-config-file", type=str, default=None)
    pre.add_argument("--model-config-file", type=str, default=None)
    pre_args, _ = pre.parse_known_args(args)

    # gather YAML layers: explicit config paths first, then --config_path
    yaml_cfg: Dict[str, Any] = {}
    paths = list(additional_config_paths)
    if pre_args.reader_config_file:
        paths.append(pre_args.reader_config_file)
    if pre_args.model_config_file:
        paths.append(pre_args.model_config_file)
    if pre_args.config_path:
        paths.append(pre_args.config_path)
    for path in paths:
        with open(path) as f:
            layer = yaml.safe_load(f) or {}
        yaml_cfg.update(_flatten_yaml_keys(layer))

    model_name = (
        pre_args.model
        or yaml_cfg.get("model")
        or yaml_cfg.get("vision_model")
        or "unet"
    )

    parser = argparse.ArgumentParser(description=f"ml_mdm_tpu {mode}")
    parser.add_argument("--config_path", "--config-path", dest="config_path",
                        type=str, default=None)
    parser.add_argument("--reader-config-file", type=str, default=None)
    parser.add_argument("--model-config-file", type=str, default=None)
    _add_common_arguments(parser)
    _MODE_EXTRAS[mode](parser)

    ns, unknown = parser.parse_known_args(args)
    ns.model = model_name

    # YAML scalar keys override argparse defaults (CLI wins over YAML below)
    cli_set = _explicit_cli_dests(parser, args)
    extra = []
    for key, value in yaml_cfg.items():
        if key in ("unet_config", "diffusion_config", "reader_config"):
            continue
        if hasattr(ns, key):
            if key not in cli_set:
                setattr(ns, key, value)
        else:
            extra.append(key)

    # nested config sections
    sink: List[str] = []
    model_cfg_cls = get_model_config_cls(model_name)
    pipeline_cfg_cls = get_pipeline_config_cls(model_name)
    ns.unet_config = dataclass_from_dict(
        model_cfg_cls, yaml_cfg.get("unet_config"), sink
    )
    ns.diffusion_config = dataclass_from_dict(
        pipeline_cfg_cls, yaml_cfg.get("diffusion_config"), sink
    )
    ns.reader_config = dataclass_from_dict(
        ReaderConfig, yaml_cfg.get("reader_config"), sink
    )

    # flat-key routing: the reference's simple_parsing BOTH mode lets
    # top-level YAML keys address nested dataclass fields (e.g.
    # ``mixed_ratio: '2:1'`` at top level lands in diffusion_config)
    targets = [
        ns.diffusion_config,
        getattr(ns.diffusion_config, "sampler_config", None),
        ns.unet_config,
        ns.reader_config,
    ]
    routed = set()
    for key in list(extra):
        for target in targets:
            if target is not None and hasattr(target, key):
                value = yaml_cfg[key]
                if isinstance(value, str) and value in ("None", "null"):
                    value = None
                setattr(target, key, value)
                routed.add(key)
                break
    extra = [k for k in extra if k not in routed]

    # dotted CLI overrides: --section.field value
    _apply_dotted_overrides(ns, unknown)

    ns.extra_config = sorted(set(extra + sink))
    if ns.extra_config:
        logging.info(
            "Ignoring unknown config keys (reference-compatible tolerance): "
            f"{ns.extra_config}"
        )
    for section in (ns.unet_config, ns.diffusion_config, ns.reader_config):
        warn_inert_fields(section)
    return ns


def _explicit_cli_dests(parser, args):
    """Which dests were explicitly provided on the CLI (so they beat YAML)."""
    import sys

    argv = list(sys.argv[1:]) if args is None else list(args)
    dests = set()
    for action in parser._actions:
        for opt in action.option_strings:
            if opt in argv or any(a.startswith(opt + "=") for a in argv):
                dests.add(action.dest)
    return dests


def _apply_dotted_overrides(ns, unknown):
    i = 0
    while i < len(unknown):
        tok = unknown[i]
        if tok.startswith("--") and "." in tok:
            if "=" in tok:
                key, value = tok[2:].split("=", 1)
                i += 1
            else:
                key = tok[2:]
                value = unknown[i + 1] if i + 1 < len(unknown) else None
                i += 2
            parts = key.replace("-", "_").split(".")
            obj = ns
            ok = True
            for part in parts[:-1]:
                if not hasattr(obj, part):
                    ok = False
                    break
                obj = getattr(obj, part)
            if ok and hasattr(obj, parts[-1]):
                old = getattr(obj, parts[-1])
                setattr(obj, parts[-1], _coerce_like(old, value))
        else:
            i += 1


def _coerce_like(old, value):
    if isinstance(old, bool):
        return str(value).lower() in ("1", "true", "yes")
    if isinstance(old, int):
        return int(value)
    if isinstance(old, float):
        return float(value)
    if isinstance(old, (list, tuple)):
        return yaml.safe_load(value)
    return value
