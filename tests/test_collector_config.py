"""opentelemetry-collector style service config -> runnable Ray Data
pipelines (pipelines/config.collector_from_yaml): receivers
(filelog incl. multiline/header/operators, parquet), processors
(transform/filter/attributes/redaction/probabilistic_sampler),
exporters (file/Parquet), service.pipelines wiring, and fail-loud on
unsupported component types."""

import glob
import os

import pyarrow.parquet as pq
import pytest

from opentelemetry_collector_contrib_ray.pipelines.config import (
    collector_from_yaml,
)


def _write_log(tmp_path, name, text):
    p = tmp_path / name
    p.write_text(text)
    return str(p)


def test_end_to_end_logs_pipeline(ray_session, tmp_path):
    log = _write_log(tmp_path, "app.log",
                     "INFO start id=1 user=alice\n"
                     "DEBUG noisy id=2 user=bob\n"
                     "ERROR boom id=3 user=carol\n")
    out = str(tmp_path / "out")
    pipes = collector_from_yaml(f"""
receivers:
  filelog:
    include: ["{log}"]
    operators:
      - type: regex_parser
        parse_from: line
        regex: '^(?P<level>\\w+) (?P<msg>\\w+) id=(?P<id>\\d+) user=(?P<user>\\w+)'
processors:
  filter:
    logs:
      log_record:
        - 'level == "DEBUG"'
  transform:
    log_statements:
      - statements:
          - 'set(env, "prod")'
          - 'set(user_upper, Upper(user))'
  attributes:
    actions:
      - action: insert
        key: team
        value: core
exporters:
  file:
    path: {out}
service:
  pipelines:
    logs:
      receivers: [filelog]
      processors: [filter, transform, attributes]
      exporters: [file]
""")
    paths = pipes["logs"].run()
    assert paths == {"file": out}
    df = pq.read_table(out).to_pandas().sort_values("line_no")
    assert list(df["level"]) == ["INFO", "ERROR"]  # DEBUG dropped
    assert list(df["user_upper"]) == ["ALICE", "CAROL"]
    assert set(df["env"]) == {"prod"} and set(df["team"]) == {"core"}


def test_multiline_and_header_receivers(ray_session, tmp_path):
    _write_log(tmp_path, "ml.log",
               "#svc=payments\n"
               "[entry] first\ncontinued line\n[entry] second\n")
    out = str(tmp_path / "o2")
    # header and multiline are mutually exclusive receiver features in
    # this loader; exercise header here (multiline covered below)
    pipes = collector_from_yaml(f"""
receivers:
  filelog:
    include: ["{tmp_path}/ml.log"]
    header:
      pattern: '^#'
      metadata_regexes: ['^#svc=(?P<svc>.*)']
exporters:
  file:
    path: {out}
service:
  pipelines:
    logs:
      receivers: [filelog]
      exporters: [file]
""")
    pipes["logs"].run()
    df = pq.read_table(out).to_pandas()
    assert set(df["svc"]) == {"payments"}
    assert len(df) == 3  # header line consumed

    out3 = str(tmp_path / "o3")
    pipes = collector_from_yaml(f"""
receivers:
  filelog/ml:
    include: ["{tmp_path}/ml.log"]
    multiline:
      line_start_pattern: '^[#\\[]'
exporters:
  file/x:
    path: {out3}
service:
  pipelines:
    logs:
      receivers: [filelog/ml]
      exporters: [file/x]
""")
    pipes["logs"].run()
    df = pq.read_table(out3).to_pandas().sort_values("first_line_no")
    assert list(df["line"]) == ["#svc=payments", "[entry] first\ncontinued line",
                                "[entry] second"]


def test_sampler_and_redaction(ray_session, tmp_path):
    log = _write_log(tmp_path, "s.log", "".join(
        f"INFO m id={i} user=u{i}\n" for i in range(200)))
    out = str(tmp_path / "o4")
    pipes = collector_from_yaml(f"""
receivers:
  filelog:
    include: ["{log}"]
    operators:
      - type: regex_parser
        parse_from: line
        regex: '^(?P<level>\\w+) m id=(?P<id>\\d+) user=(?P<user>\\w+)'
processors:
  probabilistic_sampler:
    sampling_percentage: 50
    from_attribute: id
  redaction:
    allowed_keys: [id, user]
    blocked_values: ['u1\\d\\d']
exporters:
  file:
    path: {out}
service:
  pipelines:
    logs:
      receivers: [filelog]
      processors: [probabilistic_sampler, redaction]
      exporters: [file]
""")
    pipes["logs"].run()
    df = pq.read_table(out).to_pandas()
    assert 50 < len(df) < 150  # ~50% by id hash
    assert set(df.columns) == {"id", "user"}  # non-allowlisted dropped
    assert all(u == "****" or not u.startswith("u1") or len(u) < 4
               for u in df["user"])  # u1xx masked


def test_unsupported_components_fail_loud(tmp_path):
    with pytest.raises(ValueError, match="unsupported receiver"):
        collector_from_yaml("""
receivers:
  kafka: {}
exporters:
  file: {path: /tmp/x}
service:
  pipelines:
    logs: {receivers: [kafka], exporters: [file]}
""")
    with pytest.raises(ValueError, match="unsupported processor"):
        collector_from_yaml("""
receivers:
  parquet: {path: /tmp/in}
processors:
  sumologic: {}
exporters:
  file: {path: /tmp/x}
service:
  pipelines:
    logs: {receivers: [parquet], processors: [sumologic], exporters: [file]}
""")
    with pytest.raises(ValueError, match="requires service.pipelines"):
        collector_from_yaml("receivers: {}\n")


def test_routing_connector(ray_session, tmp_path):
    # connector/routingconnector: one upstream pipeline fans out by an
    # ordered condition table to downstream pipelines; unrouted rows
    # follow default_pipelines
    log = _write_log(tmp_path, "r.log",
                     "ERROR boom id=1\nINFO ok id=2\nERROR again id=3\n"
                     "WARN hmm id=4\n")
    out_err = str(tmp_path / "errs")
    out_rest = str(tmp_path / "rest")
    pipes = collector_from_yaml(f"""
receivers:
  filelog:
    include: ["{log}"]
    operators:
      - type: regex_parser
        parse_from: line
        regex: '^(?P<level>\\w+) (?P<msg>\\w+) id=(?P<id>\\d+)'
connectors:
  routing:
    table:
      - condition: 'level == "ERROR"'
        pipelines: [logs/errors]
    default_pipelines: [logs/other]
exporters:
  file/errors:
    path: {out_err}
  file/other:
    path: {out_rest}
service:
  pipelines:
    logs/in:
      receivers: [filelog]
      exporters: [routing]
    logs/errors:
      receivers: [routing]
      exporters: [file/errors]
    logs/other:
      receivers: [routing]
      exporters: [file/other]
""")
    pipes["logs/errors"].run()
    pipes["logs/other"].run()
    errs = pq.read_table(out_err).to_pandas()
    rest = pq.read_table(out_rest).to_pandas()
    assert sorted(errs["id"]) == ["1", "3"]
    assert sorted(rest["id"]) == ["2", "4"]
    assert "sink" not in errs.columns


def test_batch_noop_logdedup_and_json_exporter(ray_session, tmp_path):
    # batch/memory_limiter accepted as documented no-ops; logdedup
    # maps to dedup_windowed; file exporter format: json writes
    # JSON lines (the reference fileexporter's shape)
    import json

    log = _write_log(tmp_path, "d.log",
                     "ERROR boom id=1\nERROR boom id=2\nINFO ok id=3\n")
    out = str(tmp_path / "oj")
    pipes = collector_from_yaml(f"""
receivers:
  filelog:
    include: ["{log}"]
    operators:
      - type: regex_parser
        parse_from: line
        regex: '^(?P<level>\\w+) (?P<msg>\\w+) id=(?P<id>\\d+)'
      - type: time_parser
        parse_from: id
        layout_type: epoch
        layout: s
processors:
  batch: {{}}
  memory_limiter: {{}}
  logdedup:
    id_field: id
    ts_field: timestamp
    exclude_fields: [id, line, line_no, path, timestamp]
exporters:
  file:
    path: {out}
    format: json
service:
  pipelines:
    logs:
      receivers: [filelog]
      processors: [batch, memory_limiter, logdedup]
      exporters: [file]
""")
    pipes["logs"].run()
    rows = []
    for f in glob.glob(os.path.join(out, "*.json")):
        with open(f) as fh:
            rows += [json.loads(ln) for ln in fh if ln.strip()]
    by_msg = {(r["level"], r["msg"]): r["log_count"] for r in rows}
    assert by_msg[("ERROR", "boom")] == 2 and by_msg[("INFO", "ok")] == 1


def test_statement_sections_and_partitioned_exporter(ray_session, tmp_path):
    log = _write_log(tmp_path, "p.log",
                     "ERROR a id=1\nINFO b id=2\nERROR c id=3\n")
    out = str(tmp_path / "part")
    pipes = collector_from_yaml(f"""
receivers:
  filelog:
    include: ["{log}"]
    operators:
      - type: regex_parser
        parse_from: line
        regex: '^(?P<level>\\w+) (?P<msg>\\w+) id=(?P<id>\\d+)'
processors:
  transform:
    trace_statements:
      - statements: ['set(kind, "span-ish")']
exporters:
  file:
    path: {out}
    partition_by: [level]
service:
  pipelines:
    logs:
      receivers: [filelog]
      processors: [transform]
      exporters: [file]
""")
    pipes["logs"].run()
    parts = {os.path.basename(d) for d in glob.glob(os.path.join(out, "*"))}
    assert parts == {"level=ERROR", "level=INFO"}
    df = pq.read_table(out).to_pandas()
    assert set(df["kind"]) == {"span-ish"} and len(df) == 3


def test_parquet_receiver_column_pruning_and_logstransform(ray_session, tmp_path):
    import pyarrow as pa

    src = str(tmp_path / "in")
    pq.write_table(pa.table({"a": ["x", "y"], "b": [1, 2],
                             "unused": ["big"] * 2}),
                   src + ".parquet")
    out = str(tmp_path / "o5")
    pipes = collector_from_yaml(f"""
receivers:
  parquet:
    path: {src}.parquet
    columns: [a, b]
processors:
  logstransform:
    operators:
      - type: transform
        statements:
          - 'set(a2, Upper(a))'
exporters:
  file:
    path: {out}
service:
  pipelines:
    logs:
      receivers: [parquet]
      processors: [logstransform]
      exporters: [file]
""")
    pipes["logs"].run()
    df = pq.read_table(out).to_pandas()
    assert set(df.columns) == {"a", "b", "a2"}  # 'unused' pruned at read
    assert list(df.sort_values("a")["a2"]) == ["X", "Y"]


def test_metric_scan_processors(ray_session, tmp_path):
    import pandas as pd
    import pyarrow as pa

    src = str(tmp_path / "m.parquet")
    pq.write_table(pa.table({
        "k": ["a", "a", "a", "b", "b"],
        "ts": pd.to_datetime(["2024-01-01 00:00:00", "2024-01-01 00:00:10",
                              "2024-01-01 00:00:20", "2024-01-01 00:00:00",
                              "2024-01-01 00:00:30"]),
        "v": [10.0, 15.0, 25.0, 1.0, 4.0],
    }), src)
    out = str(tmp_path / "o6")
    pipes = collector_from_yaml(f"""
receivers:
  parquet:
    path: {src}
processors:
  cumulativetodelta:
    key_field: k
    ts_field: ts
    value_field: v
exporters:
  file:
    path: {out}
service:
  pipelines:
    logs:
      receivers: [parquet]
      processors: [cumulativetodelta]
      exporters: [file]
""")
    pipes["logs"].run()
    df = pq.read_table(out).to_pandas().sort_values(["k", "ts"])
    assert list(df["delta"].fillna(-1)) == [-1, 5.0, 10.0, -1, 3.0] or \
        list(df["delta"]) == [0.0, 5.0, 10.0, 0.0, 3.0]


def test_tail_sampling_processor(ray_session, tmp_path):
    # tailsamplingprocessor policy YAML (config.go:312-330 nested
    # shape) through the loader: latency OR error-status keeps a
    # trace; a drop policy vetoes a blocked tool
    import pyarrow as pa

    rows = []
    def trace(tid, n, dur_step_ms, status=200, tool="calc"):
        for i in range(n):
            rows.append({"trace_id": tid, "ts": i * dur_step_ms * 1000,
                         "status": status, "tool": tool})
    trace("slow", 4, 60)        # 180ms total -> latency keeps
    trace("err", 3, 10, status=500)   # status keeps
    trace("fast", 3, 10)        # nothing keeps
    trace("blocked", 4, 60, tool="secret")  # latency would keep, drop vetoes
    t = pa.table({
        "trace_id": [r["trace_id"] for r in rows],
        "ts": pa.array([r["ts"] for r in rows], pa.timestamp("us")),
        "status": [r["status"] for r in rows],
        "tool": [r["tool"] for r in rows],
    })
    src = str(tmp_path / "spans.parquet")
    pq.write_table(t, src)
    out = str(tmp_path / "o7")
    pipes = collector_from_yaml(f"""
receivers:
  parquet:
    path: {src}
processors:
  tail_sampling:
    group_key: trace_id
    ts_field: ts
    policies:
      - name: keep-slow
        type: latency
        latency:
          threshold_ms: 100
      - name: keep-errors
        type: status_code
        status_code:
          key: status
          status_codes: [500]
      - name: veto-secret
        type: drop
        drop:
          drop_sub_policy:
            - type: string_attribute
              string_attribute:
                key: tool
                values: [secret]
exporters:
  file:
    path: {out}
service:
  pipelines:
    traces:
      receivers: [parquet]
      processors: [tail_sampling]
      exporters: [file]
""")
    pipes["traces"].run()
    df = pq.read_table(out).to_pandas()
    assert set(df["trace_id"]) == {"slow", "err"}
    assert len(df) == 7  # every row of each sampled trace


def test_probabilistic_sampler_modes(ray_session, tmp_path):
    import pyarrow as pa

    src = str(tmp_path / "t.parquet")
    pq.write_table(pa.table({
        "trace_id": [__import__("hashlib").md5(str(i).encode()).hexdigest()
                     for i in range(1, 2001)],
        "v": list(range(2000)),
    }), src)
    out = str(tmp_path / "o8")
    pipes = collector_from_yaml(f"""
receivers:
  parquet:
    path: {src}
processors:
  probabilistic_sampler:
    mode: equalizing
    sampling_percentage: 25
    from_attribute: trace_id
exporters:
  file:
    path: {out}
service:
  pipelines:
    logs:
      receivers: [parquet]
      processors: [probabilistic_sampler]
      exporters: [file]
""")
    pipes["logs"].run()
    df = pq.read_table(out).to_pandas()
    assert 350 < len(df) < 650  # ~25%


def test_count_connector(ray_session, tmp_path):
    # connector/countconnector: a logs pipeline exports into `count`,
    # a metrics pipeline receives the grouped counts
    import pyarrow as pa

    src = str(tmp_path / "l.parquet")
    pq.write_table(pa.table({
        "level": ["ERROR", "ERROR", "INFO", "WARN", "ERROR"],
        "team": ["a", "b", "a", "a", None],
    }), src)
    out = str(tmp_path / "o9")
    pipes = collector_from_yaml(f"""
receivers:
  parquet:
    path: {src}
connectors:
  count:
    logs:
      error.count:
        conditions: ['level == "ERROR"']
        attributes:
          - key: team
            default_value: none
exporters:
  file:
    path: {out}
service:
  pipelines:
    logs:
      receivers: [parquet]
      exporters: [count]
    metrics:
      receivers: [count]
      exporters: [file]
""")
    pipes["metrics"].run()
    df = pq.read_table(out).to_pandas().sort_values("team")
    got = dict(zip(df["team"], df["error.count"]))
    assert got == {"a": 1, "b": 1, "none": 1}


def test_spanmetrics_connector(ray_session, tmp_path):
    # connector/spanmetricsconnector: explicit-bounds duration
    # histogram + call counts per dimension
    import pyarrow as pa

    src = str(tmp_path / "s2.parquet")
    pq.write_table(pa.table({
        "svc": ["a", "a", "a", "b"],
        "dur": [1.0, 3.0, 900.0, 5.0],
    }), src)
    out = str(tmp_path / "o10")
    pipes = collector_from_yaml(f"""
receivers:
  parquet:
    path: {src}
connectors:
  spanmetrics:
    duration_column: dur
    dimensions:
      - name: svc
    histogram:
      explicit:
        buckets: [2, 4, 6, 8, 10, 50, 100, 250, 500, 1000]
exporters:
  file:
    path: {out}
service:
  pipelines:
    traces:
      receivers: [parquet]
      exporters: [spanmetrics]
    metrics:
      receivers: [spanmetrics]
      exporters: [file]
""")
    pipes["metrics"].run()
    df = pq.read_table(out).to_pandas()
    rows = {(r.svc, r.bucket): (r.call_count, r.duration_sum)
            for r in df.itertuples()}
    # np.digitize(right=True): 1.0 -> bucket 0 (<=2); 3.0 -> bucket 1
    # (<=4); 900 -> bucket 9 (<=1000); 5.0 -> bucket 2 (<=6)
    assert rows[("a", 0)] == (1, 1.0)
    assert rows[("a", 1)] == (1, 3.0)
    assert rows[("a", 9)] == (1, 900.0)
    assert rows[("b", 2)] == (1, 5.0)


def test_interval_and_metricstransform_processors(ray_session, tmp_path):
    import pandas as pd
    import pyarrow as pa

    src = str(tmp_path / "iv.parquet")
    pq.write_table(pa.table({
        "k": ["a", "a", "b"],
        "region": ["e", "e", "w"],
        "ts": pd.to_datetime(["2024-01-01 00:10:00", "2024-01-01 00:40:00",
                              "2024-01-01 00:20:00"]),
        "v": [1.0, 2.0, 5.0],
    }), src)
    out = str(tmp_path / "o11")
    pipes = collector_from_yaml(f"""
receivers:
  parquet:
    path: {src}
processors:
  interval:
    key_fields: [k, region]
    ts_field: ts
    value_field: v
  metricstransform:
    action: aggregate_labels
    label_set: [region]
    value_field: last_value
exporters:
  file:
    path: {out}
service:
  pipelines:
    metrics:
      receivers: [parquet]
      processors: [interval, metricstransform]
      exporters: [file]
""")
    pipes["metrics"].run()
    df = pq.read_table(out).to_pandas().sort_values("region")
    # interval keeps last-per-hour (as last_value): a->2.0, b->5.0;
    # aggregate_labels then regroups to region only: e=2.0, w=5.0
    got = dict(zip(df["region"], df["last_value"]))
    assert got == {"e": 2.0, "w": 5.0}


def test_exceptions_connector(ray_session, tmp_path):
    import pyarrow as pa

    src = str(tmp_path / "e.parquet")
    pq.write_table(pa.table({
        "severity_text": ["ERROR", "ERROR", "INFO"],
        "svc": ["a", "b", "a"],
    }), src)
    out = str(tmp_path / "o12")
    pipes = collector_from_yaml(f"""
receivers:
  parquet:
    path: {src}
connectors:
  exceptions:
    condition: 'severity_text == "ERROR"'
    dimensions:
      - name: svc
exporters:
  file:
    path: {out}
service:
  pipelines:
    traces:
      receivers: [parquet]
      exporters: [exceptions]
    metrics:
      receivers: [exceptions]
      exporters: [file]
""")
    pipes["metrics"].run()
    df = pq.read_table(out).to_pandas().sort_values("svc")
    assert dict(zip(df["svc"], df["exceptions_total"])) == {"a": 1, "b": 1}


def test_run_with_manifest_skips_committed_exporters(ray_session, tmp_path):
    import json

    log = _write_log(tmp_path, "m.log", "INFO a id=1\nINFO b id=2\n")
    out = str(tmp_path / "o13")
    man_root = str(tmp_path / "man")
    yaml_text = f"""
receivers:
  filelog:
    include: ["{log}"]
    operators:
      - type: regex_parser
        parse_from: line
        regex: '^(?P<level>\\w+) (?P<msg>\\w+) id=(?P<id>\\d+)'
exporters:
  file:
    path: {out}
service:
  pipelines:
    logs:
      receivers: [filelog]
      exporters: [file]
"""
    pipes = collector_from_yaml(yaml_text)
    paths = pipes["logs"].run(manifest_root=man_root)
    assert paths == {"file": out}
    entry = json.load(open(os.path.join(man_root, "_manifest",
                                        "exporter%3Afile.json")))
    assert entry["metrics"]["rows"] == 2 and entry["output"] == out

    # rerun: committed exporter skipped (files untouched)
    before = {f: os.path.getmtime(f)
              for f in glob.glob(os.path.join(out, "*.parquet"))}
    paths2 = collector_from_yaml(yaml_text)["logs"].run(manifest_root=man_root)
    assert paths2 == {"file": out}
    after = {f: os.path.getmtime(f)
             for f in glob.glob(os.path.join(out, "*.parquet"))}
    assert before == after


def test_cardinality_guardian_and_genai_processors(ray_session, tmp_path):
    import pyarrow as pa

    src = str(tmp_path / "cg.parquet")
    pq.write_table(pa.table({
        "tool": ["a"] * 5 + ["b"] * 3 + ["rare1", "rare2"],
        "model": ["gpt-x"] * 10,
    }), src)
    out = str(tmp_path / "o14")
    pipes = collector_from_yaml(f"""
receivers:
  parquet:
    path: {src}
processors:
  cardinality_guardian:
    field: tool
    max_values: 2
  genai:
    sources:
      - name: custom
        mappings:
          model: gen_ai.request.model
exporters:
  file:
    path: {out}
service:
  pipelines:
    logs:
      receivers: [parquet]
      processors: [cardinality_guardian, genai]
      exporters: [file]
""")
    pipes["logs"].run()
    df = pq.read_table(out).to_pandas()
    assert set(df["tool"]) == {"a", "b", "__overflow__"}
    assert set(df["gen_ai.request.model"]) == {"gpt-x"}


def test_metricsgeneration_and_starttime(ray_session, tmp_path):
    import pandas as pd
    import pyarrow as pa

    src = str(tmp_path / "mg.parquet")
    pq.write_table(pa.table({
        "k": ["a", "a", "a"],
        "ts": pd.to_datetime(["2024-01-01 00:00:00", "2024-01-01 00:01:00",
                              "2024-01-01 00:02:00"]),
        "total": [10.0, 20.0, 5.0],
        "count": [2.0, 4.0, 1.0],
    }), src)
    out = str(tmp_path / "o15")
    pipes = collector_from_yaml(f"""
receivers:
  parquet:
    path: {src}
processors:
  metricsgeneration:
    rules:
      - name: avg
        type: calculate
        metric1: total
        operation: divide
        metric2: count
  metricstarttime:
    key_fields: [k]
    ts_field: ts
    value_field: total
exporters:
  file:
    path: {out}
service:
  pipelines:
    metrics:
      receivers: [parquet]
      processors: [metricsgeneration, metricstarttime]
      exporters: [file]
""")
    pipes["metrics"].run()
    df = pq.read_table(out).to_pandas().sort_values("ts")
    assert list(df["avg"]) == [5.0, 5.0, 5.0]
    # true_reset_point: every point carries the key's first-seen ts
    assert set(df["start_time"]) == {pd.Timestamp("2024-01-01 00:00:00")}


def test_pipeline_exports_to_file_and_connector(ray_session, tmp_path):
    # one traces pipeline feeding BOTH a file sink and the spanmetrics
    # connector (tail-sampled stream flows into both)
    import pyarrow as pa

    src = str(tmp_path / "sp.parquet")
    rows = []
    for tid, n, step in [("slow", 4, 60_000_000), ("fast", 3, 1_000_000)]:
        for i in range(n):
            rows.append((tid, i * step, "svc1", 50.0))
    pq.write_table(pa.table({
        "trace_id": [r[0] for r in rows],
        "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
        "svc": [r[2] for r in rows],
        "dur": [r[3] for r in rows],
    }), src)
    out_t = str(tmp_path / "ot")
    out_m = str(tmp_path / "om")
    pipes = collector_from_yaml(f"""
receivers:
  parquet:
    path: {src}
processors:
  tail_sampling:
    group_key: trace_id
    ts_field: ts
    policies:
      - name: slow
        type: latency
        latency: {{threshold_ms: 100000}}
connectors:
  spanmetrics:
    duration_column: dur
    dimensions: [{{name: svc}}]
exporters:
  file/sampled: {{path: {out_t}}}
  file/metrics: {{path: {out_m}}}
service:
  pipelines:
    traces:
      receivers: [parquet]
      processors: [tail_sampling]
      exporters: [file/sampled, spanmetrics]
    metrics:
      receivers: [spanmetrics]
      exporters: [file/metrics]
""")
    pipes["traces"].run()
    pipes["metrics"].run()
    t = pq.read_table(out_t).to_pandas()
    assert set(t["trace_id"]) == {"slow"} and len(t) == 4
    m = pq.read_table(out_m).to_pandas()
    # spanmetrics sees only the sampled stream: 4 calls for svc1
    assert int(m["call_count"].sum()) == 4


def test_schema_processor(ray_session, tmp_path):
    import pyarrow as pa

    src = str(tmp_path / "sc.parquet")
    pq.write_table(pa.table({"http.method": ["GET"], "v": [1]}), src)
    out = str(tmp_path / "o16")
    pipes = collector_from_yaml(f"""
receivers:
  parquet:
    path: {src}
processors:
  schema:
    family: demo
    source: "1.0.0"
    target: "1.1.0"
    versions:
      "1.1.0":
        http.method: http.request.method
exporters:
  file:
    path: {out}
service:
  pipelines:
    logs:
      receivers: [parquet]
      processors: [schema]
      exporters: [file]
""")
    pipes["logs"].run()
    df = pq.read_table(out).to_pandas()
    assert "http.request.method" in df.columns
    assert "http.method" not in df.columns


def test_resourcedetection_processor(ray_session, tmp_path, monkeypatch):
    import pyarrow as pa

    monkeypatch.setenv("OTEL_RESOURCE_ATTRIBUTES",
                       "service.name=demo,deployment=prod")
    src = str(tmp_path / "rd.parquet")
    pq.write_table(pa.table({"v": [1, 2]}), src)
    out = str(tmp_path / "o17")
    pipes = collector_from_yaml(f"""
receivers:
  parquet:
    path: {src}
processors:
  resourcedetection:
    detectors: [env]
exporters:
  file:
    path: {out}
service:
  pipelines:
    logs:
      receivers: [parquet]
      processors: [resourcedetection]
      exporters: [file]
""")
    pipes["logs"].run()
    df = pq.read_table(out).to_pandas()
    assert set(df["service.name"]) == {"demo"}
    assert set(df["deployment"]) == {"prod"}


def test_roundrobin_connector(ray_session, tmp_path):
    import pyarrow as pa

    src = str(tmp_path / "rr.parquet")
    pq.write_table(pa.table({"v": list(range(10))}), src)
    out_a = str(tmp_path / "rra")
    out_b = str(tmp_path / "rrb")
    pipes = collector_from_yaml(f"""
receivers:
  parquet:
    path: {src}
connectors:
  roundrobin: {{}}
exporters:
  file/a: {{path: {out_a}}}
  file/b: {{path: {out_b}}}
service:
  pipelines:
    logs/in:
      receivers: [parquet]
      exporters: [roundrobin]
    logs/a:
      receivers: [roundrobin]
      exporters: [file/a]
    logs/b:
      receivers: [roundrobin]
      exporters: [file/b]
""")
    pipes["logs/a"].run()
    pipes["logs/b"].run()
    a = pq.read_table(out_a).to_pandas()
    b = pq.read_table(out_b).to_pandas()
    assert len(a) + len(b) == 10 and abs(len(a) - len(b)) <= 1
    assert sorted(list(a["v"]) + list(b["v"])) == list(range(10))


def test_lookup_processor(ray_session, tmp_path):
    # processor/lookupprocessor README config shape: source + lookups
    # (key -> attributes with destination + default); flat-model key
    # paths: log.attributes["user.id"] reduces to the column
    import pyarrow as pa
    import pyarrow.parquet as _pq

    users = pa.table({"uid": ["u1", "u2"], "name": ["alice", "bob"],
                      "team": ["core", "infra"]})
    db = str(tmp_path / "users.parquet")
    _pq.write_table(users, db)
    log = _write_log(tmp_path, "l.log", "m1 u1\nm2 u2\nm3 u9\n")
    out = str(tmp_path / "out")
    pipes = collector_from_yaml(f"""
receivers:
  filelog:
    include: ["{log}"]
    operators:
      - type: regex_parser
        parse_from: line
        regex: '^(?P<msg>\\w+) (?P<user_id>\\w+)'
processors:
  lookup:
    source:
      type: parquet
      path: {db}
      key_column: uid
    lookups:
      - key: log.attributes["user_id"]
        attributes:
          - destination: user.name
            source_column: name
            default: "Unknown User"
          - destination: team
            source_column: team
exporters:
  file:
    path: {out}
service:
  pipelines:
    logs:
      receivers: [filelog]
      processors: [lookup]
      exporters: [file]
""")
    pipes["logs"].run()
    df = pq.read_table(out).to_pandas().sort_values("msg")
    assert list(df["user.name"]) == ["alice", "bob", "Unknown User"]
    assert list(df["team"])[:2] == ["core", "infra"]
    assert df["team"].isna().iloc[2]  # no default -> silent-miss null


def test_geoip_processor(ray_session, tmp_path):
    # processor/geoipprocessor README shape (providers + attributes);
    # concrete provider = the engine's file-backed CIDR table
    import pyarrow as pa
    import pyarrow.parquet as _pq

    db = pa.table({"cidr": ["10.0.0.0/8", "192.168.1.0/24"],
                   "country": ["US", "DE"], "city": ["nyc", "ber"]})
    dbp = str(tmp_path / "geo.parquet")
    _pq.write_table(db, dbp)
    log = _write_log(tmp_path, "g.log",
                     "a 10.1.2.3\nb 192.168.1.77\nc 8.8.8.8\n")
    out = str(tmp_path / "out")
    pipes = collector_from_yaml(f"""
receivers:
  filelog:
    include: ["{log}"]
    operators:
      - type: regex_parser
        parse_from: line
        regex: '^(?P<msg>\\w+) (?P<client_address>[\\d\\.]+)'
processors:
  geoip:
    providers:
      cidr_file:
        database_path: {dbp}
    context: record
    attributes: [client_address]
exporters:
  file:
    path: {out}
service:
  pipelines:
    logs:
      receivers: [filelog]
      processors: [geoip]
      exporters: [file]
""")
    pipes["logs"].run()
    df = pq.read_table(out).to_pandas().sort_values("msg")
    assert list(df["country"].fillna("-")) == ["US", "DE", "-"]
    assert list(df["city"].fillna("-")) == ["nyc", "ber", "-"]


def test_unroll_and_span_processors(ray_session, tmp_path):
    # processor/unrollprocessor (flat-model: field + split_pattern) and
    # processor/spanprocessor README name.from_attributes shape
    log = _write_log(tmp_path, "u.log",
                     "db-q1 mysql select\ndb-q2 pg insert\n")
    out = str(tmp_path / "out")
    out2 = str(tmp_path / "out2")
    pipes = collector_from_yaml(f"""
receivers:
  filelog:
    include: ["{log}"]
    operators:
      - type: regex_parser
        parse_from: line
        regex: '^(?P<name>[\\w-]+) (?P<db_svc>\\w+) (?P<ops>[\\w ]+)'
processors:
  span:
    name:
      from_attributes: ["db_svc", "ops"]
      separator: "::"
  unroll:
    field: ops
    out_field: op
    split_pattern: " "
service:
  pipelines:
    spans:
      receivers: [filelog]
      processors: [span]
      exporters: []
    words:
      receivers: [filelog]
      processors: [unroll]
      exporters: []
""")
    spans = pipes["spans"].dataset().to_pandas().sort_values("db_svc")
    assert list(spans["name"]) == ["mysql::select", "pg::insert"]
    words = pipes["words"].dataset().to_pandas()
    assert sorted(words["op"]) == ["insert", "select"]
    # recursive fails loud
    with pytest.raises(ValueError, match="recursive"):
        collector_from_yaml(f"""
receivers:
  filelog:
    include: ["{log}"]
processors:
  unroll:
    field: ops
    recursive: true
service:
  pipelines:
    l: {{receivers: [filelog], processors: [unroll], exporters: []}}
""")


def test_drain_and_groupbytrace_processors(ray_session, tmp_path):
    # processor/drainprocessor README masking_rules/template_attribute
    # (loader subset: masking template column); groupbytrace clusters
    # rows by trace key
    log = _write_log(tmp_path, "d.log",
                     "t2 connect from 10.0.0.1 port 4411\n"
                     "t1 connect from 10.0.0.9 port 80\n"
                     "t1 disconnect user 42\n")
    pipes = collector_from_yaml(f"""
receivers:
  filelog:
    include: ["{log}"]
    operators:
      - type: regex_parser
        parse_from: line
        regex: '^(?P<trace_id>\\w+) (?P<body>.*)$'
processors:
  drain:
    body_field: body
    template_attribute: log.record.template
    masking_rules:
      - pattern: '\\d+\\.\\d+\\.\\d+\\.\\d+'
        replacement: '<IP>'
      - pattern: '\\d+'
        replacement: '<NUM>'
  groupbytrace:
    trace_key: trace_id
service:
  pipelines:
    logs:
      receivers: [filelog]
      processors: [drain, groupbytrace]
      exporters: []
""")
    df = pipes["logs"].dataset().to_pandas()
    assert list(df["trace_id"]) == ["t1", "t1", "t2"]  # clustered
    assert set(df["log.record.template"]) == {
        "connect from <IP> port <NUM>", "disconnect user <NUM>"}


def test_dynamic_sampling_processor(ray_session, tmp_path):
    # processor/dynamicsamplingprocessor README rules shape: ordered
    # first-match rules (keep-errors always, catch-all probabilistic)
    lines = "".join(
        f"{'ERROR' if i % 10 == 0 else 'INFO'} msg{i} trace{i % 40}\n"
        for i in range(200))
    log = _write_log(tmp_path, "ds.log", lines)
    pipes = collector_from_yaml(f"""
receivers:
  filelog:
    include: ["{log}"]
    operators:
      - type: regex_parser
        parse_from: line
        regex: '^(?P<level>\\w+) (?P<msg>\\w+) (?P<trace_id>\\w+)'
processors:
  dynamic_sampling:
    trace_key: trace_id
    rules:
      - name: keep-errors
        conditions: ['level == "ERROR"']
        sampler: {{type: always_sample}}
      - name: default
        sampler: {{type: probabilistic, sampling_percentage: 25}}
service:
  pipelines:
    traces:
      receivers: [filelog]
      processors: [dynamic_sampling]
      exporters: []
""")
    df = pipes["traces"].dataset().to_pandas()
    # every trace containing an ERROR row is kept in full (20 traces
    # hit ERROR: trace0,10,20,30 mod 40 -> 4 distinct trace ids * 5 rows)
    err_traces = {f"trace{i % 40}" for i in range(0, 200, 10)}
    kept_err = df[df["sampling_rule"] == "keep-errors"]
    assert set(kept_err["trace_id"]) == err_traces
    # catch-all is 1-in-4 deterministic on the remaining traces
    rest = df[df["sampling_rule"] == "default"]
    assert set(rest["sample_rate"]) == {4}
    assert not set(rest["trace_id"]) & err_traces


def test_servicegraph_and_signaltometrics_connectors(ray_session, tmp_path):
    # connector/servicegraphconnector (client/server pairing -> edge
    # metrics) and connector/signaltometricsconnector (grouped counts)
    log = _write_log(
        tmp_path, "sg.log",
        "client t1 s1 search 1000\nserver t1 s1 search 3000\n"
        "client t2 s1 db 500\nserver t2 s1 db 4500\n"
        "client t3 s1 db 0\nserver t3 s1 db 9000\n")
    out_sg = str(tmp_path / "sg")
    out_stm = str(tmp_path / "stm")
    pipes = collector_from_yaml(f"""
receivers:
  filelog:
    include: ["{log}"]
    operators:
      - type: regex_parser
        parse_from: line
        regex: '^(?P<kind>\\w+) (?P<trace_id>\\w+) (?P<span_id>\\w+) (?P<tool>\\w+) (?P<us>\\d+)'
      - type: transform
        statements:
          - 'set(ts, Int(us))'
connectors:
  servicegraph:
    kind_field: kind
    client_value: client
    server_value: server
    on: [trace_id, span_id]
    dimensions: [tool]
  signaltometrics:
    dimensions: [kind, tool]
exporters:
  file/sg:
    path: {out_sg}
  file/stm:
    path: {out_stm}
service:
  pipelines:
    traces:
      receivers: [filelog]
      exporters: [servicegraph, signaltometrics]
    graph:
      receivers: [servicegraph]
      exporters: [file/sg]
    metrics:
      receivers: [signaltometrics]
      exporters: [file/stm]
""")
    pipes["graph"].run()
    pipes["metrics"].run()
    sg = pq.read_table(out_sg).to_pandas().set_index("tool")
    assert sg.loc["search", "n_calls"] == 1
    assert sg.loc["search", "latency_us_sum"] == 2000
    assert sg.loc["db", "n_calls"] == 2
    assert sg.loc["db", "latency_us_sum"] == 4000 + 9000
    stm = pq.read_table(out_stm).to_pandas()
    assert stm["n"].sum() == 6
    assert set(stm["kind"]) == {"client", "server"}


def test_slowsql_metricsaslogs_otlpjson_connectors(ray_session, tmp_path):
    # connector/slowsqlconnector, metricsaslogsconnector,
    # otlpjsonconnector — signal conversions as YAML connectors
    log = _write_log(
        tmp_path, "sq.log",
        'mysql 900 {"k": 1}\npostgresql 100 {"k": 2}\noracle 950 {"k": 3}\n')
    pipes = collector_from_yaml(f"""
receivers:
  filelog:
    include: ["{log}"]
    operators:
      - type: regex_parser
        parse_from: line
        regex: '^(?P<db_system>\\w+) (?P<dur>\\d+) (?P<body>.*)$'
      - type: transform
        statements:
          - 'set(dur_ns, Int(dur))'
          - 'set(stmt, "select 1")'
connectors:
  slowsql:
    duration_column: dur_ns
    threshold: 500
    db_system_column: db_system
    db_statement_column: stmt
    db_systems: [mysql, postgresql]
  metricsaslogs:
    name_column: db_system
    value_column: dur_ns
    metric_type: gauge
    keep_columns: [db_system]
  otlpjson:
    parse_from: body
    fields: {{k: int64}}
service:
  pipelines:
    traces:
      receivers: [filelog]
      exporters: [slowsql, metricsaslogs, otlpjson]
    slow:
      receivers: [slowsql]
      exporters: []
    logs:
      receivers: [metricsaslogs]
      exporters: []
    parsed:
      receivers: [otlpjson]
      exporters: []
""")
    slow = pipes["slow"].dataset().to_pandas()
    # only mysql row passes: >= threshold AND in db_systems
    assert list(slow["db.system"]) == ["mysql"]
    logs = pipes["logs"].dataset().to_pandas()
    assert len(logs) == 3 and set(logs["metric.type"]) == {"gauge"}
    parsed = pipes["parsed"].dataset().to_pandas()
    assert sorted(parsed["k"]) == [1, 2, 3]


def test_awss3_exporter_local_endpoint(ray_session, tmp_path):
    # exporter/awss3exporter config surface (config.go:27-101) driven
    # through the same writer code path, with a file:// endpoint
    # standing in for the bucket (the reference points `endpoint` at
    # S3-compatible targets the same way)
    import glob as _glob
    import json as _json

    log = _write_log(tmp_path, "s3.log", "a 1\nb 2\nc 3\n")
    root = str(tmp_path / "fake-s3")
    pipes = collector_from_yaml(f"""
receivers:
  filelog:
    include: ["{log}"]
    operators:
      - type: regex_parser
        parse_from: line
        regex: '^(?P<k>\\w+) (?P<v>\\d+)'
exporters:
  awss3/parquet:
    s3uploader:
      region: us-east-1
      s3_bucket: telemetry
      s3_prefix: logs
      s3_partition_format: 'year=%Y/month=%m/day=%d'
      s3_partition_timezone: UTC
      file_prefix: app-
      compression: zstd
      endpoint: file://{root}
    marshaler: parquet
    partition_time: '2026-03-01T10:00:00'
  awss3/json:
    s3uploader:
      s3_bucket: telemetry
      s3_base_prefix: base
      endpoint: file://{root}
    marshaler: otlp_json
service:
  pipelines:
    logs:
      receivers: [filelog]
      exporters: [awss3/parquet, awss3/json]
""")
    out = pipes["logs"].run()
    pdir = out["awss3/parquet"]
    assert pdir == f"{root}/telemetry/logs/year=2026/month=03/day=01"
    files = _glob.glob(pdir + "/*.parquet")
    assert files and all("/app-" in f for f in files)
    df = pq.read_table(pdir).to_pandas()
    assert sorted(df["k"]) == ["a", "b", "c"]
    jdir = out["awss3/json"]
    assert jdir == f"{root}/telemetry/base"
    rows = []
    for f in _glob.glob(jdir + "/*.json"):
        with open(f) as fh:
            rows += [_json.loads(line) for line in fh if line.strip()]
    assert sorted(r["k"] for r in rows) == ["a", "b", "c"]
    # unsupported marshaler / http endpoint fail loud
    with pytest.raises(ValueError, match="marshaler"):
        collector_from_yaml(f"""
receivers:
  filelog: {{include: ["{log}"]}}
exporters:
  awss3:
    s3uploader: {{s3_bucket: b, endpoint: file://{root}}}
    marshaler: sumo_ic
service:
  pipelines:
    logs: {{receivers: [filelog], exporters: [awss3]}}
""")


def test_drain_full_assignment(ray_session, tmp_path):
    # default drain mode = per-record CLUSTER template (two-pass
    # Drain); rows of the same shape share one template with
    # wildcarded variable positions
    log = _write_log(tmp_path, "dr.log",
                     "connected to alpha port 80\n"
                     "connected to beta port 443\n"
                     "connected to gamma port 8080\n"
                     "user carol logged out\n"
                     "user dave logged out\n")
    pipes = collector_from_yaml(f"""
receivers:
  filelog:
    include: ["{log}"]
processors:
  drain:
    body_field: line
    merge_threshold: 0.5
    template_attribute: template
    masking_rules:
      - pattern: '\\d+'
        replacement: '<NUM>'
service:
  pipelines:
    logs:
      receivers: [filelog]
      processors: [drain]
      exporters: []
""")
    df = pipes["logs"].dataset().to_pandas().sort_values("line_no")
    tm = list(df["template"])
    # the three connect lines share ONE cluster: host wildcarded,
    # ports pre-masked by the rule
    assert tm[0] == tm[1] == tm[2] == "connected to <*> port <NUM>"
    assert tm[3] == tm[4] == "user <*> logged out"


def test_filter_legacy_include_exclude(ray_session, tmp_path):
    """Legacy filterprocessor match_properties shape
    (testdata/config_logs_strict.yaml filter/includeexclude +
    filterlog.go NewSkipExpr): include applied first, then exclude;
    strict attribute equality; absent keys never match."""
    log = tmp_path / "legacy.log"
    log.write_text("keep yes no\ndropped-not-included no no\n"
                   "dropped-excluded yes yes\n")
    pipes = collector_from_yaml(f"""
receivers:
  filelog:
    include: ["{log}"]
    operators:
      - type: regex_parser
        parse_from: line
        regex: '^(?P<msg>\\S+) (?P<should_include>\\S+) (?P<should_exclude>\\S+)'
processors:
  filter:
    logs:
      include:
        match_type: strict
        record_attributes:
          - key: should_include
            value: "yes"
      exclude:
        match_type: strict
        record_attributes:
          - key: should_exclude
            value: "yes"
service:
  pipelines:
    logs:
      receivers: [filelog]
      processors: [filter]
      exporters: []
""")
    df = pipes["logs"].dataset().to_pandas()
    assert list(df["msg"]) == ["keep"]


def test_filter_legacy_bodies_severity(ray_session, tmp_path):
    """Legacy log_bodies regexp OR-matching + log_severity_number min
    with match_undefined (filterlog.go Eval: ALL configured groups
    must match; filterset ORs the body patterns)."""
    log = tmp_path / "sev.log"
    log.write_text("ERROR timeout upstream\nINFO timeout upstream\n"
                   "ERROR disk full\nNOSEV timeout fallback\n")
    pipes = collector_from_yaml(f"""
receivers:
  filelog:
    include: ["{log}"]
    operators:
      - type: regex_parser
        parse_from: line
        regex: '^(?P<level>\\S+) (?P<body>.*)$'
      - type: severity_parser
        parse_from: level
processors:
  filter:
    logs:
      exclude:
        match_type: regexp
        log_bodies:
          - 'timeout.*'
          - 'oom.*'
        log_severity_number:
          min: ERROR
service:
  pipelines:
    logs:
      receivers: [filelog]
      processors: [filter]
      exporters: []
""")
    df = pipes["logs"].dataset().to_pandas().sort_values("body")
    # dropped: ONLY the record matching BOTH groups (timeout body AND
    # severity >= ERROR); INFO timeout, ERROR disk and undefined-sev
    # timeout all stay
    assert sorted(df["body"]) == ["disk full", "timeout fallback",
                                  "timeout upstream"]


def test_attributes_include_exclude_gate(ray_session, tmp_path):
    """attributesprocessor config.go:23 embeds the same MatchConfig:
    actions apply only to records matching include and not exclude;
    a gated delete nulls the matching rows' value but keeps the
    column for everyone else."""
    log = tmp_path / "attrs.log"
    log.write_text("a svcA secret1\nb svcA secret2\nc svcB secret3\n")
    pipes = collector_from_yaml(f"""
receivers:
  filelog:
    include: ["{log}"]
    operators:
      - type: regex_parser
        parse_from: line
        regex: '^(?P<msg>\\S+) (?P<svc>\\S+) (?P<token>\\S+)'
processors:
  attributes:
    include:
      match_type: strict
      record_attributes:
        - key: svc
          value: svcA
    exclude:
      match_type: strict
      record_attributes:
        - key: msg
          value: b
    actions:
      - action: delete
        key: token
      - action: upsert
        key: env
        value: prod
service:
  pipelines:
    logs:
      receivers: [filelog]
      processors: [attributes]
      exporters: []
""")
    df = pipes["logs"].dataset().to_pandas().sort_values("msg")
    # only row a matches (svcA, not excluded): token nulled, env set
    assert list(df["token"].fillna("-")) == ["-", "secret2", "secret3"]
    assert list(df["env"].fillna("-")) == ["prod", "-", "-"]


def test_span_include_exclude_gate(ray_session, tmp_path):
    """spanprocessor include/exclude (testdata/config.yaml
    span/includeexclude, verbatim): regexp services+span_names include,
    strict span_names exclude; only gated spans get the to_attributes
    extraction."""
    import pyarrow as pa
    import pyarrow.parquet as pq_

    src = str(tmp_path / "spans.parquet")
    pq_.write_table(pa.table({
        "service.name": ["banks-east", "banks-east", "retail", "banks-east"],
        "name": ["auth/login", "donot/change", "auth/login", "flatname"],
    }), src)
    pipes = collector_from_yaml(f"""
receivers:
  parquet:
    path: "{src}"
processors:
  span:
    include:
      match_type: regexp
      services: ["banks"]
      span_names: ["^(.*?)/(.*?)$"]
    exclude:
      match_type: strict
      span_names: ["donot/change"]
    name:
      to_attributes:
        rules:
          - '^(?P<operation_website>.*?)/.*$'
service:
  pipelines:
    traces:
      receivers: [parquet]
      processors: [span]
      exporters: []
""")
    df = pipes["traces"].dataset().to_pandas()
    by = dict(zip(zip(df["service.name"], df.get("name", df["name"])),
                  df["operation_website"].fillna("-")))
    # only (banks-east, auth/login) passes the gate; its name is
    # rewritten by the rule and the group extracted
    assert by[("retail", "auth/login")] == "-"
    assert by[("banks-east", "donot/change")] == "-"
    assert by[("banks-east", "flatname")] == "-"
    assert "auth" in set(df["operation_website"].fillna("-"))


def test_filter_legacy_metric_names(ray_session, tmp_path):
    """Legacy metrics filter (filterconfig.go:102-105 metric_names,
    strict): exclude drops the named metrics from the stream."""
    import pyarrow as pa
    import pyarrow.parquet as pq_

    src = str(tmp_path / "metrics.parquet")
    pq_.write_table(pa.table({
        "metric": ["cpu.util", "mem.used", "cpu.util", "disk.io"],
        "value": [0.5, 100.0, 0.7, 3.0],
    }), src)
    pipes = collector_from_yaml(f"""
receivers:
  parquet:
    path: "{src}"
processors:
  filter:
    metrics:
      exclude:
        match_type: strict
        metric_names:
          - cpu.util
service:
  pipelines:
    metrics:
      receivers: [parquet]
      processors: [filter]
      exporters: []
""")
    df = pipes["metrics"].dataset().to_pandas()
    assert sorted(df["metric"]) == ["disk.io", "mem.used"]


def test_filelog_exclude_globs(ray_session, tmp_path):
    """filelog exclude globs (fileconsumer matcher): include-matched
    files dropped when any exclude pattern matches them."""
    (tmp_path / "app-1.log").write_text("keep1\n")
    (tmp_path / "app-2.log").write_text("keep2\n")
    (tmp_path / "app-1.bak.log").write_text("dropme\n")
    pipes = collector_from_yaml(f"""
receivers:
  filelog:
    include: ["{tmp_path}/*.log"]
    exclude: ["{tmp_path}/*.bak.log"]
service:
  pipelines:
    logs:
      receivers: [filelog]
      processors: []
      exporters: []
""")
    df = pipes["logs"].dataset().to_pandas()
    assert sorted(df["line"]) == ["keep1", "keep2"]


def test_otlpjson_explode_mode_yaml(ray_session, tmp_path):
    """otlpjson connector WITHOUT `fields` = the real OTLP/JSON
    payload explosion (stages/otlpjson.OtlpJsonExplode) through the
    YAML loader."""
    payload = ('{"resourceLogs":[{"resource":{"attributes":[{"key":"svc",'
               '"value":{"stringValue":"checkout"}}]},"scopeLogs":[{"scope":{},'
               '"logRecords":[{"severityNumber":17,"severityText":"Error",'
               '"body":{"stringValue":"boom"},"attributes":[{"key":"code",'
               '"value":{"intValue":"500"}}]}]}]}]}')
    log = _write_log(tmp_path, "otlp.jsonl", payload + "\n" + "not json" + "\n")
    pipes = collector_from_yaml(f"""
receivers:
  filelog:
    include: ["{log}"]
    operators:
      - type: transform
        statements:
          - 'set(body, line)'
connectors:
  otlpjson:
    resource_attributes:
      svc: string
    record_attributes:
      code: int64
service:
  pipelines:
    logs:
      receivers: [filelog]
      processors: []
      exporters: [otlpjson]
    logs/out:
      receivers: [otlpjson]
      exporters: []
""")
    df = pipes["logs/out"].dataset().to_pandas()
    assert len(df) == 1
    r = df.iloc[0]
    assert r["svc"] == "checkout" and r["code"] == 500
    assert r["body"] == "boom" and r["severity_number"] == 17


def test_stanza_transformer_operators_paste_unchanged(ray_session, tmp_path):
    """A reference stanza operator chain using the transformer type
    NAMES (add/copy/move/remove/retain — pkg/stanza/operator/
    transformer/*/config.go shapes) pastes into the filelog operators
    list unchanged; each becomes one transform-statement editor."""
    log = _write_log(tmp_path, "st.log", 'a "q1" x\nb "q2" y\n')
    pipes = collector_from_yaml(f"""
receivers:
  filelog:
    include: ["{log}"]
    operators:
      - type: regex_parser
        parse_from: line
        regex: '^(?P<msg>\\S+) (?P<quoted>\\S+) (?P<junk>\\S+)'
      - type: add
        field: attributes.env
        value: prod
      - type: copy
        from: attributes.msg
        to: msg_copy
      - type: move
        from: attributes.quoted
        to: q
      - type: unquote
        field: q
      - type: remove
        field: attributes.junk
      - type: retain
        fields: [msg, msg_copy, q, env]
service:
  pipelines:
    logs:
      receivers: [filelog]
      processors: []
      exporters: []
""")
    df = pipes["logs"].dataset().to_pandas().sort_values("msg")
    assert sorted(df.columns) == ["env", "msg", "msg_copy", "q"]
    assert list(df["msg"]) == ["a", "b"]
    assert list(df["msg_copy"]) == ["a", "b"]
    assert list(df["q"]) == ["q1", "q2"]      # unquoted
    assert set(df["env"]) == {"prod"}
