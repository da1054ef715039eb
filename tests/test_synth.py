"""Synthetic transcript generator fixture properties (FIXTURES.md F1)."""

import collections

import numpy as np
import pyarrow.compute as pc
import pytest

from opentelemetry_collector_contrib_ray.schema import TEXT_REGEX, TRANSCRIPT_SCHEMA
from opentelemetry_collector_contrib_ray.sources.lookup import build_lookup_table
from opentelemetry_collector_contrib_ray.sources.transcripts import SPAN_S, generate_transcripts


@pytest.fixture(scope="module")
def tbl():
    return generate_transcripts(30_000)


def test_schema_matches_input_hint(tbl):
    assert tbl.schema.equals(TRANSCRIPT_SCHEMA)


def test_deterministic(tbl):
    assert tbl.equals(generate_transcripts(30_000))


def test_zipf_skew(tbl):
    counts = collections.Counter(tbl["conv_id"].to_pylist())
    top = counts.most_common(1)[0][1]
    assert top / tbl.num_rows > 0.10  # a hot conversation exists


def test_malformed_rate(tbl):
    ok = pc.extract_regex(tbl["text"].combine_chunks(), pattern=TEXT_REGEX).is_valid()
    rate = pc.sum(pc.cast(ok, "int64")).as_py() / tbl.num_rows
    assert 0.95 < rate < 0.99  # ~3% malformed


def test_turn_idx_contiguous_and_ordered(tbl):
    df = tbl.select(["conv_id", "turn_idx"]).to_pandas()
    for conv, g in df.groupby("conv_id"):
        idx = g["turn_idx"].to_numpy()
        assert (idx == np.arange(len(idx))).all(), conv


def test_hour_cardinality_bounded(tbl):
    hours = pc.unique(pc.floor_temporal(tbl["ts"].combine_chunks(), unit="hour"))
    # conv offsets span 72h, wrap bounds per-turn drift to another 72h
    assert len(hours) <= 2 * SPAN_S // 3600 + 2


def test_embedded_time_roundtrips(tbl):
    ok_rows = pc.extract_regex(tbl["text"].combine_chunks(), pattern=TEXT_REGEX)
    mask = ok_rows.is_valid()
    parsed = pc.strptime(pc.struct_field(ok_rows, "time"), format="%Y-%m-%d %H:%M:%S", unit="us",
                         error_is_null=True)
    ts = tbl["ts"].combine_chunks()
    eq = pc.equal(parsed, ts)
    assert pc.all(pc.if_else(mask, eq, True)).as_py()


def test_lookup_table_has_deliberate_misses():
    lk = build_lookup_table()
    keys = set(lk["key"].to_pylist())
    assert "assistant:" in keys and "tool:bash" in keys
    assert not any(k.startswith("system:") for k in keys)  # misses -> defaults path
