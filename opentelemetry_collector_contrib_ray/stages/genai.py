"""GenAI attribute normalizer — vendor span attributes -> OTel GenAI
semantic conventions.

Reference semantics (processor/genainormalizerprocessor/README.md):
an ordered list of sources, each with a source-attr -> target-attr
rename table (``mappings``), optional per-target value folds
(``value_mappings``), ``overwrite`` (replace an existing target or
skip the mapping) and ``remove_originals`` (drop the source attrs
after mapping). Built-in sources ``openinference`` / ``openllmetry``
carry pre-defined tables; any other name is user-defined.

Columnar model: attributes are columns, so every source compiles to a
short list of transform Statements fused into ONE map_batches —
rename = copy/coalesce (row-level: an existing non-null target value
is preserved unless ``overwrite``), value folds = the vectorized
``value_map`` editor. The built-in tables here are the representative
core of the reference's (the full tables are vendor-specific and
long; extend MAPPINGS as needed).
"""

from __future__ import annotations

from typing import Any

from ..expr import Col
from . import register
from .transform import TransformStage

BUILTIN_MAPPINGS: dict[str, dict[str, str]] = {
    # OpenLLMetry (Traceloop) span attrs -> OTel GenAI semconv
    "openllmetry": {
        "llm.request.model": "gen_ai.request.model",
        "llm.response.model": "gen_ai.response.model",
        "llm.usage.prompt_tokens": "gen_ai.usage.input_tokens",
        "llm.usage.completion_tokens": "gen_ai.usage.output_tokens",
        "llm.request.temperature": "gen_ai.request.temperature",
        "llm.request.max_tokens": "gen_ai.request.max_tokens",
        "llm.vendor": "gen_ai.system",
    },
    # OpenInference (Arize) span attrs
    "openinference": {
        "llm.model_name": "gen_ai.request.model",
        "llm.token_count.prompt": "gen_ai.usage.input_tokens",
        "llm.token_count.completion": "gen_ai.usage.output_tokens",
        "llm.invocation_parameters.temperature": "gen_ai.request.temperature",
        "llm.provider": "gen_ai.system",
    },
}


def genai_normalizer(sources: list[dict[str, Any]]) -> TransformStage:
    """Build the fused normalization stage from a ``sources`` list
    (README.md Source table: name / mappings / value_mappings /
    overwrite / remove_originals)."""
    statements: list[dict] = []
    for src_cfg in sources:
        name = src_cfg["name"]
        mappings = src_cfg.get("mappings")
        if name in BUILTIN_MAPPINGS:
            if mappings:
                raise ValueError(f"built-in source {name!r} rejects custom mappings")
            mappings = BUILTIN_MAPPINGS[name]
        elif not mappings:
            raise ValueError(f"user-defined source {name!r} requires mappings")
        overwrite = src_cfg.get("overwrite", False)
        for s, t in mappings.items():
            if overwrite:
                statements.append({"editor": "copy", "args": {"src": s, "dst": t}})
            else:
                # keep an existing target value row-wise; create the
                # column when absent (coalesce handles both)
                statements.append({"editor": "coalesce",
                                   "args": {"target": t, "sources": [Col(t), Col(s)]}})
        for target, folds in (src_cfg.get("value_mappings") or {}).items():
            statements.append({"editor": "value_map",
                               "args": {"target": target, "mapping": dict(folds)}})
        if src_cfg.get("remove_originals"):
            statements.append({"editor": "delete_keys", "args": {"keys": list(mappings)}})
    return TransformStage(statements, error_mode="ignore")


register("genai_normalizer")(genai_normalizer)
