"""schemaprocessor / resourcedetection / remotetap analogs."""

import glob
import os

import pyarrow as pa
import pyarrow.parquet as pq
import ray.data

from opentelemetry_collector_contrib_ray.stages.resourcedetect import (
    apply_resource,
    detect_resource,
    env_detector,
)
from opentelemetry_collector_contrib_ray.stages.schema import (
    SchemaTranslation,
    schema_convert,
)
from opentelemetry_collector_contrib_ray.stages.tap import remote_tap

TRANS = SchemaTranslation(
    family="https://example.test/schemas",
    versions={
        "1.1.0": {"net.peer.name": "server.address"},
        "1.2.0": {"http.method": "http.request.method"},
    },
)


def _tbl(**cols):
    return pa.table({k: pa.array(v) for k, v in cols.items()})


def test_schema_upgrade_hard_renames_chain(ray_session):
    t = _tbl(**{"net.peer.name": ["a", None], "http.method": ["GET", "POST"]})
    out = schema_convert(ray.data.from_arrow(t), TRANS,
                         source="1.0.0", target="1.2.0").to_pandas()
    assert "net.peer.name" not in out.columns
    assert "http.method" not in out.columns
    assert list(out["server.address"]) == ["a", None]
    assert list(out["http.request.method"]) == ["GET", "POST"]


def test_schema_partial_window_and_downgrade(ray_session):
    t = _tbl(**{"server.address": ["x"], "http.request.method": ["GET"]})
    # downgrade 1.2.0 -> 1.0.0 reverses both renames, descending
    out = schema_convert(ray.data.from_arrow(t), TRANS,
                         source="1.2.0", target="1.0.0").to_pandas()
    assert set(out.columns) == {"net.peer.name", "http.method"}
    # source 1.1.0 -> target 1.2.0 applies only the 1.2.0 changeset
    t2 = _tbl(**{"net.peer.name": ["keep"], "http.method": ["GET"]})
    out2 = schema_convert(ray.data.from_arrow(t2), TRANS,
                          source="1.1.0", target="1.2.0").to_pandas()
    assert "net.peer.name" in out2.columns  # 1.1.0 changeset not in window


def test_schema_soft_migration_keeps_both_and_never_overwrites(ray_session):
    # rows: old only / both present / new only
    t = _tbl(**{"http.method": ["GET", "POST", None],
                "http.request.method": [None, "PUT", "DELETE"]})
    out = schema_convert(ray.data.from_arrow(t), TRANS, source="1.1.0",
                         target="1.2.0", migrate_from="1.1.0").to_pandas()
    assert list(out["http.method"]) == ["GET", "POST", None]  # old kept
    # new filled only where absent; both-present row untouched
    assert list(out["http.request.method"]) == ["GET", "PUT", "DELETE"]


def test_schema_hard_rename_old_wins_on_conflict(ray_session):
    t = _tbl(**{"http.method": ["GET", None],
                "http.request.method": ["stale", "new"]})
    out = schema_convert(ray.data.from_arrow(t), TRANS,
                         source="1.1.0", target="1.2.0").to_pandas()
    assert list(out["http.request.method"]) == ["GET", "new"]
    assert "http.method" not in out.columns


def test_env_detector_and_first_wins_merge(monkeypatch):
    monkeypatch.setenv("OTEL_RESOURCE_ATTRIBUTES",
                       "service.name=api, deployment.environment=prod")
    assert env_detector() == {"service.name": "api",
                              "deployment.environment": "prod"}
    merged = detect_resource([
        lambda: {"host.name": "a", "k": "first"},
        lambda: {"k": "second", "os.type": "linux"},
    ])
    assert merged == {"host.name": "a", "k": "first", "os.type": "linux"}


def test_apply_resource_override_semantics(ray_session):
    t = _tbl(**{"conv_id": ["c1", "c2"], "host.name": ["row-host", None]})
    res = {"host.name": "det-host", "os.type": "linux"}
    keep = apply_resource(ray.data.from_arrow(t), res).to_pandas()
    # override=False: row value wins, null filled from detection
    assert list(keep["host.name"]) == ["row-host", "det-host"]
    assert list(keep["os.type"]) == ["linux", "linux"]
    force = apply_resource(ray.data.from_arrow(t), res,
                           override=True).to_pandas()
    assert list(force["host.name"]) == ["det-host", "det-host"]


def test_remote_tap_pass_through_and_bounded(ray_session, tmp_path):
    tap = str(tmp_path / "tap")
    t = _tbl(conv_id=[f"c{i}" for i in range(100)],
             v=list(range(100)))
    ds = ray.data.from_arrow(t).repartition(4)
    out = remote_tap(ds, tap, limit_per_block=5,
                     columns=["conv_id"]).to_pandas()
    # stream unchanged
    assert len(out) == 100 and set(out.columns) == {"conv_id", "v"}
    files = glob.glob(os.path.join(tap, "tap-*.parquet"))
    assert 1 <= len(files) <= 4
    tapped = pa.concat_tables([pq.read_table(f) for f in files])
    assert tapped.num_rows <= 4 * 5
    assert tapped.column_names == ["conv_id"]
    assert set(tapped["conv_id"].to_pylist()) <= set(t["conv_id"].to_pylist())


def test_adjacent_edges_presorted_matches_join(ray_session):
    """Presorted fast path == generic hash-join pairing, including
    pairs split across block boundaries."""
    import pyarrow as pa
    from datetime import datetime, timedelta

    from opentelemetry_collector_contrib_ray.stages.servicegraph import (
        adjacent_edges_presorted,
        service_graph_edges,
    )

    T0 = datetime(2024, 1, 1)
    rows = []
    for c in range(6):
        conv = f"c{c:03d}"
        for i in range(7):
            role = "user" if i % 2 == 0 else "assistant"
            tool = ["search", "db", "llm"][i % 3]
            rows.append((conv, i, role, tool, T0 + timedelta(seconds=c * 100 + i)))
    t = pa.table({"conv_id": pa.array([r[0] for r in rows]),
                  "turn_idx": pa.array([r[1] for r in rows], pa.int64()),
                  "role": pa.array([r[2] for r in rows]),
                  "tool": pa.array([r[3] for r in rows]),
                  "ts": pa.array([r[4] for r in rows], pa.timestamp("us"))})
    # 5 blocks cut mid-conversation -> boundary pairs exist
    import ray.data as rd
    blocks = [t.slice(0, 9), t.slice(9, 8), t.slice(17, 1), t.slice(18, 10),
              t.slice(28)]
    ds = rd.from_arrow(blocks)
    fast = adjacent_edges_presorted(
        ds, "conv_id", "turn_idx", client_role="user",
        server_role="assistant", role_col="role", ts_col="ts",
        edge_dim="tool").to_pandas().sort_values("tool").reset_index(drop=True)

    def client_side(b):
        import pyarrow.compute as pc
        f = b.filter(pc.equal(b["role"], "user"))
        return pa.table({"conv_id": f["conv_id"],
                         "match_idx": pc.add(pc.cast(f["turn_idx"], pa.int64()), 1),
                         "ts": f["ts"]})

    def server_side(b):
        import pyarrow.compute as pc
        f = b.filter(pc.equal(b["role"], "assistant"))
        return pa.table({"conv_id": f["conv_id"],
                         "match_idx": pc.cast(f["turn_idx"], pa.int64()),
                         "tool": f["tool"], "ts": f["ts"]})

    client = rd.from_arrow(blocks).map_batches(client_side, batch_format="pyarrow", batch_size=None)
    server = rd.from_arrow(blocks).map_batches(server_side, batch_format="pyarrow", batch_size=None)
    ref = service_graph_edges(client, server, ["conv_id", "match_idx"],
                              ["tool"], num_partitions=4) \
        .to_pandas().sort_values("tool").reset_index(drop=True)
    assert list(fast.tool) == list(ref.tool)
    assert list(fast.n_calls) == list(ref.n_calls)
    assert list(fast.latency_us_sum) == list(ref.latency_us_sum)


def test_hopping_window_aggregate(ray_session):
    """Every event lands in exactly width/slide windows; tumbling
    (width == slide) matches a plain floor-truncate groupby."""
    import collections
    from datetime import datetime, timedelta

    import pyarrow as pa
    import ray.data as rd

    from opentelemetry_collector_contrib_ray.stages.window import (
        hopping_window_aggregate,
    )

    T0 = datetime(2024, 1, 1)
    rows = [("a", T0 + timedelta(minutes=37 * i), i) for i in range(40)]
    t = pa.table({"k": pa.array([r[0] for r in rows]),
                  "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
                  "v": pa.array([r[2] for r in rows], pa.int64())})
    ds = rd.from_arrow(t).repartition(3)
    out = hopping_window_aggregate(ds, "ts", ["k"], width_s=7200,
                                   slide_s=3600, sum_cols={"v": "v_sum"}) \
        .to_pandas()
    # oracle: replicate each row into its 2 covering windows
    cnt = collections.Counter()
    vs = collections.Counter()
    for _, ts, v in rows:
        h = int(ts.timestamp() // 3600)
        for i in (0, 1):
            if (h - i) >= 0:
                cnt[h - i] += 1
                vs[h - i] += v
    got = {int(r.window_start.timestamp() // 3600): (r.n, r.v_sum)
           for r in out.itertuples()}
    assert got == {h: (cnt[h], vs[h]) for h in cnt}
    assert out.n.sum() == 2 * len(rows)  # every event in exactly 2 windows
    # degenerate tumbling case
    out1 = hopping_window_aggregate(ds, "ts", ["k"], width_s=3600,
                                    slide_s=3600).to_pandas()
    assert out1.n.sum() == len(rows)


def test_range_join_broadcast(ray_session):
    from datetime import datetime, timedelta

    import pyarrow as pa
    import pytest
    import ray.data as rd

    from opentelemetry_collector_contrib_ray.stages.rangejoin import (
        range_join_broadcast,
    )

    T0 = datetime(2024, 1, 1)
    rows = [(i, T0 + timedelta(minutes=i)) for i in range(120)]
    t = pa.table({"rid": pa.array([r[0] for r in rows], pa.int64()),
                  "ts": pa.array([r[1] for r in rows], pa.timestamp("us"))})
    iv = pa.table({"s": pa.array([T0 + timedelta(minutes=10),
                                  T0 + timedelta(minutes=60)], pa.timestamp("us")),
                   "e": pa.array([T0 + timedelta(minutes=20),
                                  T0 + timedelta(minutes=90)], pa.timestamp("us")),
                   "label": ["w1", "w2"]})
    ds = rd.from_arrow(t).repartition(3)
    out = range_join_broadcast(ds, "ts", iv, start_col="s", end_col="e",
                               payload_cols=["label"]).to_pandas()
    # [10,20) -> 10 rows, [60,90) -> 30 rows; start inclusive, end exclusive
    assert len(out) == 40
    assert set(out[out.label == "w1"].rid) == set(range(10, 20))
    assert set(out[out.label == "w2"].rid) == set(range(60, 90))
    left = range_join_broadcast(rd.from_arrow(t), "ts", iv, start_col="s",
                                end_col="e", payload_cols=["label"],
                                how="left").to_pandas()
    assert len(left) == 120 and left.label.isna().sum() == 80
    # overlapping intervals fail loud
    bad = pa.table({"s": pa.array([T0, T0 + timedelta(minutes=5)], pa.timestamp("us")),
                    "e": pa.array([T0 + timedelta(minutes=10),
                                   T0 + timedelta(minutes=7)], pa.timestamp("us")),
                    "label": ["a", "b"]})
    with pytest.raises(ValueError, match="overlap"):
        range_join_broadcast(rd.from_arrow(t), "ts", bad, start_col="s",
                             end_col="e", payload_cols=["label"])


# ---------------------------------------------------------------- r4


def test_consistent_sampler_modes():
    # probabilisticsampler proportional/equalizing/fail_closed/priority
    # (processor/probabilisticsamplerprocessor/sampler_mode.go)
    import pyarrow as pa

    from opentelemetry_collector_contrib_ray.stages.sample import (
        _MAX_ADJ,
        ConsistentSampler,
        parse_tvalue,
        probability_to_threshold,
        tvalue_of,
    )

    # threshold math pinned: p=0.5 -> t-value "8", p=0.25 -> "c",
    # p=1 -> "0" (always), out-of-range -> never
    assert tvalue_of(probability_to_threshold(0.5)) == "8"
    assert tvalue_of(probability_to_threshold(0.25)) == "c"
    assert tvalue_of(probability_to_threshold(1.0)) == "0"
    assert probability_to_threshold(1e-30) is None

    def tid(r56: int) -> str:
        return "0" * 18 + format(r56, "014x")

    tbl = pa.table({
        "trace_id": [tid(0x90000000000000),   # R just above p=.5 cut
                     tid(0x10000000000000),   # low R
                     "not-a-trace-id",        # invalid randomness
                     tid(0xFFFFFFFFFFFFFF)],  # max R
        "tv": ["0", "8", "0", "8"],           # incoming p: 1, .5, 1, .5
        "prio": [0.0, 0.0, 100.0, 0.0],
        "i": [0, 1, 2, 3],
    })
    # equalizing @50%: t = max(t_cfg=2^55, t_in)
    eq = ConsistentSampler("equalizing", 50.0, randomness_src="trace_id",
                           incoming_tvalue_src="tv", out_tvalue="tval")
    out = eq.fn(tbl)
    # row0 R=0x90.. >= 2^55 keep; row1 R low drop; row2 invalid ->
    # fail-open keep; row3 keep
    assert out["i"].to_pylist() == [0, 2, 3]
    assert out["tval"].to_pylist()[0] == "8"
    # fail_closed drops the invalid row unless priority rescues it
    eqc = ConsistentSampler("equalizing", 50.0, randomness_src="trace_id",
                            incoming_tvalue_src="tv", fail_closed=True)
    assert eqc.fn(tbl)["i"].to_pylist() == [0, 3]
    eqp = ConsistentSampler("equalizing", 50.0, randomness_src="trace_id",
                            incoming_tvalue_src="tv", fail_closed=True,
                            priority_src="prio")
    # priority=100% replaces the threshold AFTER fail_closed -> row2 kept
    assert eqp.fn(tbl)["i"].to_pylist() == [0, 2, 3]

    # proportional @50% composes with the incoming probability:
    # row1/row3 arrived at p=.5 -> effective .25 -> t-value "c"
    pr = ConsistentSampler("proportional", 50.0, randomness_src="trace_id",
                           incoming_tvalue_src="tv", out_tvalue="tval")
    out = pr.fn(tbl)
    got = dict(zip(out["i"].to_pylist(), out["tval"].to_pylist()))
    assert got[3] == "c"          # .5 * .5
    assert got[0] == "8"          # 1 * .5
    assert parse_tvalue("c") == int(0.75 * _MAX_ADJ)


def test_span_processor_reference_semantics():
    # processor/spanprocessor/span.go: from_attributes all-or-nothing,
    # to_attributes {placeholder} rewrite + extraction, sequential
    # rules on the UPDATED name, break_after_match, keep_original_name
    import pyarrow as pa

    from opentelemetry_collector_contrib_ray.stages.spanrename import (
        SpanProcessor,
        _segment_pattern,
    )

    numbered, rewrite, names = _segment_pattern(
        r"^/api/v1/document/(?P<documentId>.*)/update$")
    assert names == ["documentId"] and "{documentId}" in rewrite

    t = pa.table({"name": ["/api/v1/document/12345/update", "/nope"],
                  "svc": ["auth", "db"], "ver": ["v1", None]})
    # the reference README's canonical example
    sp = SpanProcessor(
        to_attributes=[r"^/api/v1/document/(?P<documentId>.*)/update$"])
    o = sp.fn(t)
    assert o["name"].to_pylist() == \
        ["/api/v1/document/{documentId}/update", "/nope"]
    assert o["documentId"].to_pylist() == ["12345", None]
    # keep_original_name extracts without renaming
    sp = SpanProcessor(
        to_attributes=[r"^/api/v1/document/(?P<documentId>.*)/update$"],
        keep_original_name=True)
    o = sp.fn(t)
    assert o["name"].to_pylist()[0] == "/api/v1/document/12345/update"
    assert o["documentId"].to_pylist() == ["12345", None]
    # from_attributes: every attribute must be present on the row
    sp = SpanProcessor(from_attributes=["svc", "ver"], separator="::")
    o = sp.fn(t)
    assert o["name"].to_pylist() == ["auth::v1", "/nope"]
    # second rule runs on the FIRST rule's output name
    sp = SpanProcessor(to_attributes=[r"/document/(?P<id>\d+)/",
                                      r"^/(?P<root>[a-z]+)/"])
    o = sp.fn(t)
    assert o["name"].to_pylist()[0] == "/{root}/v1/document/{id}/update"
    assert o["id"].to_pylist() == ["12345", None]
    assert o["root"].to_pylist() == ["api", None]  # '/nope': no match


def test_span_to_attributes_matches_reference_algorithm():
    # property check: the vectorized segment-rewrite equals a direct
    # python port of processToAttributes (span.go:153-205) across
    # random names and rules
    import random
    import re

    import pyarrow as pa

    from opentelemetry_collector_contrib_ray.stages.spanrename import (
        SpanProcessor,
    )

    def reference(name, patterns):
        attrs = {}
        for pat in patterns:
            m = re.search(pat, name)
            if m is None:
                continue
            sb, idx = [], 0
            gi = {v: k for k, v in re.compile(pat).groupindex.items()}
            for i in range(1, m.re.groups + 1):
                if i not in gi:
                    continue
                attrs[gi[i]] = m.group(i)
                sb.append(name[idx:m.start(i)] + "{" + gi[i] + "}")
                idx = m.end(i)
            sb.append(name[idx:])
            name = "".join(sb)
        return name, attrs

    rng = random.Random(7)
    words = ["api", "v1", "doc", "user", "42", "abc123", "x"]
    rules = [r"/(?P<id>\d+)", r"^/(?P<svc>[a-z]+)/",
             r"(?P<word>[a-z]+)(?P<num>\d+)"]
    for _ in range(60):
        name = "/" + "/".join(rng.choice(words)
                              for _ in range(rng.randint(1, 5)))
        pats = rng.sample(rules, rng.randint(1, len(rules)))
        want_name, want_attrs = reference(name, pats)
        sp = SpanProcessor(to_attributes=pats)
        out = sp.fn(pa.table({"name": [name]}))
        assert out["name"][0].as_py() == want_name, (name, pats)
        for k, v in want_attrs.items():
            assert out[k][0].as_py() == v, (name, pats, k)


def test_parse_severity_reference_vectors():
    # func_parse_severity_test.go vectors: type-strict matching —
    # numbers hit only ranges (incl. "2xx" placeholders), strings only
    # equals; first matching level wins
    import pyarrow as pa

    from opentelemetry_collector_contrib_ray.stages.transform import (
        Statement,
    )

    testing_mapping = {  # the file's getTestingGetter shape
        "debug": [{"range": {"min": 100, "max": 199}}],
        "info": [{"equals": ["inf", "information"]}, {"range": "2xx"}],
        "error": [{"range": {"min": 400, "max": 599}}],
    }

    def run(values, mapping):
        t = pa.table({"v": pa.array(values)})
        return Statement("parse_severity_custom",
                         {"target": "o", "src": "v",
                          "mapping": mapping})(t)["o"].to_pylist()

    assert run([400, 100, 200, 250, 350], testing_mapping) == \
        ["error", "debug", "info", "info", None]
    assert run(["inf", "information", "warning", "400"], testing_mapping) == \
        ["info", "info", None, None]  # strings never match ranges
    # "2xx" placeholder == explicit 200-299
    assert run([200], {"info": [{"range": "2xx"}]}) == ["info"]
    import pytest

    with pytest.raises(ValueError):
        run([200], {"info": [{"range": "9xx"}]})


def test_useragent_reference_vectors():
    # func_useragent_test.go:20-135 (the ua-parser expectations the
    # vectorized cascade reproduces, incl. Mobile variants, 3-segment
    # version truncation, and the generic product/version fallback)
    import pyarrow as pa

    from opentelemetry_collector_contrib_ray.stages.transform import (
        Statement,
    )

    vecs = [
        ("Mozilla/5.0 (Linux; Android 4.1.1; SPH-L710 Build/JRO03L) "
         "AppleWebKit/535.19 (KHTML, like Gecko) Chrome/18.0.1025.166 "
         "Mobile Safari/535.19", "Chrome Mobile", "18.0.1025", "Android"),
        ("Mozilla/5.0 (X11; Linux x86_64; rv:126.0) Gecko/20100101 "
         "Firefox/126.0", "Firefox", "126.0", "Linux"),
        ("Mozilla/5.0 (X11; Linux x86_64) AppleWebKit/537.36 (KHTML, "
         "like Gecko) Chrome/51.0.2704.103 Safari/537.36",
         "Chrome", "51.0.2704", "Linux"),
        ("Mozilla/5.0 (iPhone; CPU iPhone OS 13_5_1 like Mac OS X) "
         "AppleWebKit/605.1.15 (KHTML, like Gecko) Version/13.1.1 "
         "Mobile/15E148 Safari/604.1", "Mobile Safari", "13.1.1", "iOS"),
        ("Mozilla/5.0 (Windows NT 10.0; Win64; x64) AppleWebKit/537.36 "
         "(KHTML, like Gecko) Chrome/91.0.4472.124 Safari/537.36 "
         "Edg/91.0.864.59", "Edge", "91.0.864", "Windows"),
        ("Mozilla/5.0 (X11; Linux x86_64) AppleWebKit/537.36 (KHTML, "
         "like Gecko) Chrome/51.0.2704.106 Safari/537.36 OPR/38.0.2220.41",
         "Opera", "38.0.2220", "Linux"),
        ("curl/7.81.0", "curl", "7.81.0", None),
        ("foobar/1.2.3 (foo; bar baz)", "foobar", "1.2.3", None),
    ]
    t = pa.table({"ua": [v[0] for v in vecs]})
    out = Statement("useragent", {"src": "ua"})(t)
    for i, (_, name, version, os_name) in enumerate(vecs):
        assert out["user_agent.name"][i].as_py() == name, i
        assert out["user_agent.version"][i].as_py() == version, i
        if os_name is not None:
            assert out["user_agent.os"][i].as_py() == os_name, i


def test_schema_metric_renames_golden(ray_session):
    """schemaprocessor metric-name renames ported from
    processor_metrics_test.go one_version_upgrade/_downgrade
    (testdata/{old,new}-metric.yaml): the 1.9.0 changeset renames the
    resource attr, the datapoint attr, AND the metric NAMES; upgrade
    applies it, downgrade reverses it. Metric names are VALUES of the
    metric column in the flat model."""
    import pandas as pd
    import ray.data

    from opentelemetry_collector_contrib_ray.stages.schema import (
        SchemaTranslation,
        schema_convert,
    )

    trans = SchemaTranslation(
        family="https://example.com/s",
        versions={"1.9.0": {"old.resource.name": "new.resource.name",
                            "old.attr.name": "new.attr.name"}},
        metric_versions={"1.9.0": {"old.sum.metric": "new.sum.metric",
                                   "old.gauge.metric": "new.gauge.metric",
                                   "old.histogram.metric": "new.histogram.metric",
                                   "old.summary.metric": "new.summary.metric"}},
    )
    old = pd.DataFrame({
        "metric": ["old.sum.metric", "old.gauge.metric",
                   "old.histogram.metric", "unrelated.metric"],
        "old.resource.name": ["test-cluster"] * 4,
        "old.attr.name": ["test-cluster"] * 4,
        "value": [1.0, 2.0, 3.0, 4.0],
    })
    up = schema_convert(ray.data.from_pandas(old), trans,
                        source="1.8.0", target="1.9.0").to_pandas()
    assert sorted(up["metric"]) == ["new.gauge.metric", "new.histogram.metric",
                                    "new.sum.metric", "unrelated.metric"]
    assert "new.resource.name" in up.columns and "old.resource.name" not in up.columns
    assert "new.attr.name" in up.columns

    down = schema_convert(ray.data.from_pandas(
        up.rename(columns={})), trans,
        source="1.9.0", target="1.8.0").to_pandas()
    assert sorted(down["metric"]) == sorted(old["metric"])
    assert "old.resource.name" in down.columns and "new.resource.name" not in down.columns
