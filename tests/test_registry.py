"""The operator registry / config-driven pipeline surface (mirrors the
stanza registry + YAML operator chains, pkg/stanza/operator/registry.go
and pipeline/config.go)."""

import pyarrow as pa
import ray.data

from opentelemetry_collector_contrib_ray.expr import col
from opentelemetry_collector_contrib_ray.stages import build_pipeline, build_stage, registered_types


def test_registry_has_core_types():
    types = registered_types()
    for t in ["regex_parser", "transcript_parser", "grok_parser", "json_parser",
              "csv_parser", "key_value_parser", "uri_parser", "severity_parser",
              "transform", "filter", "lookup", "router", "recombine",
              "probabilistic_sampler", "attributes", "redaction"]:
        assert t in types, t


def test_build_pipeline_from_config():
    from opentelemetry_collector_contrib_ray.sources.transcripts import generate_transcripts

    pipeline = build_pipeline([
        {"type": "transcript_parser", "on_error": "drop"},
        {"type": "filter", "condition": (">=", col("status"), 400), "mode": "keep"},
        {"type": "transform", "statements": [
            {"editor": "upper", "args": {"target": "level_up", "src": "level"}},
        ]},
    ])
    ds = ray.data.from_arrow(generate_transcripts(2000))
    out = pipeline(ds)
    tbl = pa.concat_tables([pa.table(b) for b in out.iter_batches(batch_format="pyarrow")],
                           promote_options="none")
    assert tbl.num_rows > 0
    assert set(tbl["level_up"].to_pylist()) <= {"WARN", "ERROR"}
    assert min(tbl["status"].to_pylist()) >= 400


def test_build_stage_unknown_type():
    import pytest

    with pytest.raises(ValueError):
        build_stage({"type": "nope"})
