"""Round-4 continuation additions: IsRootSpan (func_is_root_span.go)
over the flat span model."""

import pyarrow as pa

from opentelemetry_collector_contrib_ray.ottl import (
    parse_statement,
    transform_from_ottl,
)
from opentelemetry_collector_contrib_ray.stages.transform import Statement


def spans_table():
    # func_is_root_span_test.go: all-zero parent id -> root,
    # any nonzero byte -> not root. Flat-model additions: null and ""
    # also mean "no parent" (pdata can't express those; a flat table
    # can, and both read as root).
    return pa.table({
        "span_id": ["a1" * 8, "b2" * 8, "c3" * 8, "d4" * 8],
        "parent_span_id": ["0" * 16, "01" + "0" * 14, None, ""],
        "name": ["s0", "s1", "s2", "s3"],
    })


def test_is_root_span_editor():
    out = Statement("is_root_span",
                    {"target": "o", "src": "parent_span_id"})(spans_table())
    assert out["o"].to_pylist() == [True, False, True, True]


def test_is_root_span_textual_set():
    stage = transform_from_ottl(
        ['set(root, IsRootSpan())'], error_mode="propagate")
    out = stage.fn(spans_table())
    assert out["root"].to_pylist() == [True, False, True, True]


def test_is_root_span_where_predicate():
    stage = transform_from_ottl(
        ['set(name, "root-span") where IsRootSpan()'],
        error_mode="propagate")
    out = stage.fn(spans_table())
    assert out["name"].to_pylist() == ["root-span", "s1",
                                       "root-span", "root-span"]


def test_is_root_span_rejects_args():
    import pytest

    from opentelemetry_collector_contrib_ray.ottl import OTTLParseError

    with pytest.raises(OTTLParseError):
        parse_statement('set(x, IsRootSpan(span_id))')
