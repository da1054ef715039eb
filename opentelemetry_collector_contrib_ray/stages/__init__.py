"""Pipeline stages + the operator registry.

Mirrors the stanza operator registry pattern (reference:
pkg/stanza/operator/registry.go; operators self-register by config
``type:`` string, e.g. parser/regex/config.go:21-23): each stage class
registers under a type name, and ``build_pipeline`` wires an ordered
config list into a chain of Dataset transforms — the Ray-native
equivalent of the stanza YAML ``operators:`` chain
(pkg/stanza/pipeline/config.go).
"""

from __future__ import annotations

from typing import Any, Callable, Protocol

import ray.data


class Stage(Protocol):
    def apply(self, ds: ray.data.Dataset) -> ray.data.Dataset: ...


_REGISTRY: dict[str, Callable[..., Any]] = {}


def register(type_name: str):
    def deco(cls):
        _REGISTRY[type_name] = cls
        cls.type_name = type_name
        return cls

    return deco


def build_stage(config: dict[str, Any]):
    cfg = dict(config)
    type_name = cfg.pop("type")
    try:
        cls = _REGISTRY[type_name]
    except KeyError:
        raise ValueError(f"unknown stage type {type_name!r}; known: {sorted(_REGISTRY)}")
    return cls(**cfg)


def build_pipeline(configs: list[dict[str, Any]]):
    stages = [build_stage(c) for c in configs]

    def apply(ds: ray.data.Dataset) -> ray.data.Dataset:
        for s in stages:
            ds = s.apply(ds)
        return ds

    return apply


def registered_types() -> list[str]:
    return sorted(_REGISTRY)


# Import stage modules for their registration side effects.
from . import (  # noqa: E402,F401
    aggregate,
    attributes,
    container,
    enrich,
    failover,
    genai,
    k8sattributes,
    parse,
    recombine,
    route,
    sample,
    syslog,
    textstats,
    timeparse,
    transform,
)
