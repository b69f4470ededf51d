"""Config system: YAML `target:`/`params:` trees instantiated via a registry.

The reference builds every component reflectively from an OmegaConf tree
(utils/utils.py:27-42 `instantiate_from_config` + configs/inference_geo4d.yaml).
We keep the same YAML contract — a node is `{target: <name>, params: {...}}` —
but resolve targets through an explicit registry instead of arbitrary module
imports, so configs can't execute surprise code and old reference configs can
be consumed by aliasing their dotted paths to our constructors.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Dict

import yaml


class Registry:
    """Name -> constructor map with alias support."""

    def __init__(self):
        self._ctors: Dict[str, Callable[..., Any]] = {}

    def register(self, name: str, *aliases: str):
        def deco(fn):
            for key in (name, *aliases):
                if key in self._ctors:
                    raise KeyError(f"duplicate registry key {key!r}")
                self._ctors[key] = fn
            return fn

        return deco

    def get(self, name: str) -> Callable[..., Any]:
        if name not in self._ctors:
            raise KeyError(
                f"unknown target {name!r}; known: {sorted(self._ctors)}"
            )
        return self._ctors[name]

    def __contains__(self, name: str) -> bool:
        return name in self._ctors


# The single global registry for config-instantiable components.
components = Registry()


def instantiate(node: Any, registry: Registry | None = None, **overrides):
    """Instantiate a `{target, params}` config node (reference utils/utils.py:27)."""
    registry = registry or components
    if not isinstance(node, dict) or "target" not in node:
        raise ValueError(f"not an instantiable config node: {node!r}")
    params = dict(node.get("params") or {})
    params.update(overrides)
    return registry.get(node["target"])(**params)


def load_config(path: str) -> dict:
    with open(path) as f:
        return yaml.safe_load(f)


@dataclasses.dataclass
class PostprocessConfig:
    """Alignment/postprocess knobs (configs/inference_geo4d.yaml:169-186)."""

    not_shared_focal: bool = False
    use_gt_focal: bool = False
    flow_loss_weight: float = 0.0
    flow_loss_fn: str = "l1"
    depth_regularize_weight: float = 0.0
    n_iter: int = 500
    temporal_smoothing_weight: float = 0.015
    motion_mask_thre: float = 0.35
    flow_loss_start_epoch: float = 0.1
    flow_loss_thre: float = 20.0
    translation_weight: float = 1.0
    eval_dataset: str = "sintel"
    use_gt_mask: bool = False
    sam2_mask_refine: bool = False
    pxl_thresh: float = 50.0
    pose_schedule: str = "linear"
    silent: bool = False

    @classmethod
    def from_dict(cls, d: dict) -> "PostprocessConfig":
        known = {f.name for f in dataclasses.fields(cls)}
        return cls(**{k: v for k, v in d.items() if k in known})
