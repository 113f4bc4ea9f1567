"""Single-plane YAML config with dotted CLI overrides.

Replaces the reference's Hydra + OmegaConf + Accelerate-config + DeepSpeed-
json multi-plane setup (SURVEY.md §5 config entry, with its documented
grad-accum footgun): ONE yaml file owns model + mesh + run config; CLI
overrides are ``key.subkey=value`` tokens (hydra-style).
"""

from __future__ import annotations

import ast
import copy
from pathlib import Path
from typing import Any, Dict, List, Optional, Sequence

import yaml


def _parse_value(raw: str) -> Any:
    try:
        return ast.literal_eval(raw)
    except (ValueError, SyntaxError):
        if raw.lower() in ("true", "false"):
            return raw.lower() == "true"
        if raw.lower() in ("null", "none"):
            return None
        return raw


def apply_overrides(cfg: Dict[str, Any], overrides: Sequence[str]) -> Dict[str, Any]:
    cfg = copy.deepcopy(cfg)
    for tok in overrides:
        assert "=" in tok, f"override {tok!r} must be key=value"
        key, raw = tok.split("=", 1)
        node = cfg
        parts = key.split(".")
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = _parse_value(raw)
    return cfg


def _interpolate(cfg: Dict[str, Any], root: Optional[Dict[str, Any]] = None) -> Any:
    """Resolve ${dotted.path} references (OmegaConf-style interpolation,
    reference configs/celebv-text.yaml:34-36). A value that IS a single
    reference keeps the referent's type; embedded references inside a
    longer string (e.g. "${base}/runs", "${a}-${b}") substitute as text."""
    import re

    root = root if root is not None else cfg
    ref_re = re.compile(r"\$\{([^}]+)\}")

    def lookup(path: str):
        node: Any = root
        for p in path.split("."):
            node = node[p]
        return resolve(node)

    def resolve(v):
        if isinstance(v, dict):
            return {k: resolve(x) for k, x in v.items()}
        if isinstance(v, list):
            return [resolve(x) for x in v]
        if isinstance(v, str):
            full = ref_re.fullmatch(v)
            if full:
                return lookup(full.group(1))  # typed single reference
            return ref_re.sub(lambda m: str(lookup(m.group(1))), v)
        return v

    return resolve(cfg)


def load_config(path: str, overrides: Sequence[str] = ()) -> Dict[str, Any]:
    with open(path) as f:
        cfg = yaml.safe_load(f)
    cfg = apply_overrides(cfg, overrides)
    return _interpolate(cfg)


def setup_platform(cfg: Dict[str, Any]) -> None:
    """Honor a `platform: cpu` / `host_devices: N` config before first jax
    backend use (this environment pins JAX_PLATFORMS=axon; config.update
    overrides it)."""
    import os

    platform = cfg.get("platform")
    n = cfg.get("host_devices")
    if n:
        os.environ["XLA_FLAGS"] = (
            os.environ.get("XLA_FLAGS", "")
            + f" --xla_force_host_platform_device_count={n}"
        ).strip()
    if platform:
        import jax

        jax.config.update("jax_platforms", platform)


def config_from_argv(default_path: str, argv: Optional[List[str]] = None) -> Dict[str, Any]:
    """argv: [config_path?] [key=value ...] — first non-override token is the
    config path."""
    import sys

    argv = list(sys.argv[1:] if argv is None else argv)
    path = default_path
    overrides = []
    for tok in argv:
        if "=" in tok:
            overrides.append(tok)
        else:
            path = tok
    return load_config(path, overrides)
