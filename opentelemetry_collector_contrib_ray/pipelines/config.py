"""Config-file front-end — stanza-style YAML operator chains.

The reference's filelog receiver wires its parse chain from a YAML
``operators:`` list (pkg/stanza/pipeline/config.go; e.g.
receiver/filelogreceiver/README.md examples). A reference user's
operator YAML maps directly onto this engine's stage registry
(stages/__init__.py — registry names intentionally match the stanza
``type:`` strings: regex_parser, json_parser, recombine, router, ...).

Extras on top of plain pass-through:
  * ``type: transform`` with ``statements:`` given as STRINGS parses
    them through the textual OTTL front-end (ottl.py) — the
    transformprocessor config shape;
  * unknown types raise with the known-type list (fail loud).
"""

from __future__ import annotations

from typing import Any, Callable

import ray.data

from ..stages import build_stage, registered_types


def _normalize(cfg: dict[str, Any]) -> Any:
    cfg = dict(cfg)
    if cfg.get("type") == "transform":
        stmts = cfg.get("statements") or []
        if stmts and all(isinstance(s, str) for s in stmts):
            from ..ottl import parse_statements

            cfg["statements"] = parse_statements(stmts)
    elif cfg.get("type") == "router":
        # stanza router routes carry expr STRINGS (transformer/router):
        #   routes: [{expr: 'level == "ERROR"', sink: errors}]
        from ..ottl import parse_condition_text

        routes = []
        for r in cfg.get("routes") or []:
            r = dict(r)
            cond = r.pop("expr", None) or r.get("condition")
            if isinstance(cond, str):
                r["condition"] = parse_condition_text(cond)
            routes.append(r)
        cfg["routes"] = routes
    elif cfg.get("type") == "filter" and isinstance(cfg.get("condition"), str):
        from ..ottl import parse_condition_text

        cfg["condition"] = parse_condition_text(cfg["condition"])
    return cfg


def pipeline_from_config(operators: list[dict[str, Any]]) -> Callable[[ray.data.Dataset], ray.data.Dataset]:
    stages = [build_stage(_normalize(op)) for op in operators]

    def apply(ds: ray.data.Dataset) -> ray.data.Dataset:
        for s in stages:
            ds = s.apply(ds)
        return ds

    return apply


def logs_transform(operators: list[dict[str, Any]]) -> Callable[[ray.data.Dataset], ray.data.Dataset]:
    """logstransformprocessor (processor/logstransformprocessor): run
    a stanza operator chain as a mid-pipeline processor. Identical to
    the receiver-side chain loader — the reference embeds the same
    stanza pipeline type; here both are ``pipeline_from_config``."""
    return pipeline_from_config(operators)


def pipeline_from_yaml(text_or_path: str) -> Callable[[ray.data.Dataset], ray.data.Dataset]:
    """Accepts YAML text or a path to a YAML file with either a
    top-level ``operators:`` list (stanza receiver shape) or a bare
    list of operator configs."""
    import os

    import yaml

    if os.path.exists(text_or_path):
        with open(text_or_path) as f:
            cfg = yaml.safe_load(f)
    else:
        cfg = yaml.safe_load(text_or_path)
    if isinstance(cfg, dict):
        operators = cfg.get("operators")
        if operators is None:
            raise ValueError(
                f"config must contain an 'operators:' list; got keys {sorted(cfg)}")
    elif isinstance(cfg, list):
        operators = cfg
    else:
        raise ValueError(f"config must be a mapping or list, got {type(cfg).__name__}")
    unknown = [op.get("type") for op in operators if op.get("type") not in registered_types()]
    if unknown:
        raise ValueError(f"unknown operator types {unknown}; known: {registered_types()}")
    return pipeline_from_config(operators)
