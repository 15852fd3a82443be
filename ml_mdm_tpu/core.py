"""Generic dataclass-driven CLI builder (parity with the reference's
vestigial ``ml-mdm`` core package, ml-mdm/ml_mdm/core.py:1-35):
declare a config dataclass and a callable class, get an entry point
with ``--config-file`` YAML merging and dotted field overrides —
dependency-free (no simple_parsing)."""
from __future__ import annotations

import argparse
import dataclasses
from dataclasses import dataclass, field, is_dataclass
from typing import Any, Optional, Type


@dataclass
class MDMConfig:
    pass


class ConfigPrinter:
    def __init__(self, config) -> None:
        print(config)


_TYPE_NAMES = {"int": int, "float": float, "bool": bool, "str": str}


def _parse_value(ftype, raw: str):
    # dataclass field types are plain strings under
    # `from __future__ import annotations` — resolve the common ones
    if isinstance(ftype, str):
        ftype = _TYPE_NAMES.get(ftype, str)
    if ftype in (int, float):
        return ftype(raw)
    if ftype is bool:
        return raw.lower() in ("1", "true", "yes")
    return raw


@dataclass
class CLIBuilder:
    class_to_call: Type[Any] = ConfigPrinter
    config_class: Type[Any] = MDMConfig
    default_config: Optional[Any] = None

    def build_config(self, args=None):
        assert is_dataclass(self.config_class)
        parser = argparse.ArgumentParser()
        parser.add_argument("--config-file", type=str, default=None)
        for f in dataclasses.fields(self.config_class):
            parser.add_argument(
                f"--{f.name.replace('_', '-')}", dest=f.name,
                default=argparse.SUPPRESS,
            )
        ns = parser.parse_args(args)

        values = (
            dataclasses.asdict(self.default_config)
            if self.default_config is not None
            else {}
        )
        if ns.config_file:
            import yaml

            with open(ns.config_file) as fh:
                values.update(yaml.safe_load(fh) or {})
        fields_by_name = {
            f.name: f for f in dataclasses.fields(self.config_class)
        }
        for name, raw in vars(ns).items():
            if name == "config_file" or name not in fields_by_name:
                continue
            values[name] = (
                _parse_value(fields_by_name[name].type, raw)
                if isinstance(raw, str)
                else raw
            )
        known = set(fields_by_name)
        return self.config_class(
            **{k: v for k, v in values.items() if k in known}
        )

    def run(self, args=None):
        cfg = self.build_config(args)
        return self.class_to_call(cfg)
