"""Container parser cases mirroring the reference table tests
(pkg/stanza/operator/parser/container/parser_test.go)."""

import pandas as pd
import pyarrow as pa
import ray.data

from opentelemetry_collector_contrib_ray.stages.container import (
    ContainerParser,
    join_partials,
)

K8S_PATH = ("/var/log/pods/some_kube-scheduler-kind-control-plane_"
            "49cc7c1fd3702c40b2686ea7486091d3/kube-scheduler44/1.log")


def _parse(lines, paths=None, **kw):
    cols = {"text": lines, "line": list(range(len(lines)))}
    if paths is not None:
        cols["log.file.path"] = paths
    ds = ray.data.from_arrow(pa.table(cols))
    return ContainerParser(parse_from="text", **kw).apply(ds).to_pandas().sort_values("line")


def test_docker_autodetect():
    # parser_test.go "docker_with_auto_detection"
    line = '{"log":"INFO: log line here","stream":"stdout","time":"2029-03-30T08:31:20.545192187Z"}'
    r = _parse([line]).iloc[0]
    assert r["format"] == "docker"
    assert r["body"] == "INFO: log line here"
    assert r["log.iostream"] == "stdout"
    assert pd.isna(r["logtag"])
    assert r["event_ts"] == pd.Timestamp("2029-03-30T08:31:20.545192Z")  # us precision


def test_docker_escaped_json_fallback():
    line = '{"log":"line with \\"quotes\\" and \\\\ backslash","stream":"stderr","time":"2029-03-30T08:31:20.545Z"}'
    r = _parse([line], format="docker").iloc[0]
    assert r["body"] == 'line with "quotes" and \\ backslash'
    assert r["log.iostream"] == "stderr"


def test_crio_and_containerd_autodetect():
    # parser_test.go crio/containerd standalone cases
    crio = "2024-04-13T07:59:37.505201169-10:00 stdout F standalone crio line which is awesome!"
    ctd = "2024-04-13T07:59:37.505201169Z stdout F standalone containerd line which is awesome!"
    out = _parse([crio, ctd])
    a, b = out.iloc[0], out.iloc[1]
    assert a["format"] == "crio" and b["format"] == "containerd"
    assert a["body"] == "standalone crio line which is awesome!"
    assert b["body"] == "standalone containerd line which is awesome!"
    assert a["logtag"] == "F" and b["logtag"] == "F"
    # crio time is zone-offset aware (-10:00 -> 17:59 UTC)
    assert a["event_ts"] == pd.Timestamp("2024-04-13T17:59:37.505201Z")
    assert b["event_ts"] == pd.Timestamp("2024-04-13T07:59:37.505201Z")


def test_k8s_metadata_from_path():
    # parser_test.go "docker_with_auto_detection_and_metadata_from_file_path"
    line = '{"log":"INFO: log line here","stream":"stdout","time":"2029-03-30T08:31:20.545192187Z"}'
    r = _parse([line], paths=[K8S_PATH], add_metadata_from_filepath=True).iloc[0]
    assert r["k8s.pod.name"] == "kube-scheduler-kind-control-plane"
    assert r["k8s.pod.uid"] == "49cc7c1fd3702c40b2686ea7486091d3"
    assert r["k8s.container.name"] == "kube-scheduler44"
    assert r["k8s.container.restart_count"] == "1"
    assert r["k8s.namespace.name"] == "some"
    # rotated file path variant (".log.20240413-080000")
    r2 = _parse([line], paths=[K8S_PATH + ".20240413-080000"],
                add_metadata_from_filepath=True).iloc[0]
    assert r2["k8s.pod.name"] == "kube-scheduler-kind-control-plane"


def test_on_error_drop_and_send():
    lines = ["not a container line at all",
             "2024-04-13T07:59:37.505201169Z stdout F fine"]
    sent = _parse(lines, on_error="send")
    assert len(sent) == 2 and pd.isna(sent.iloc[0]["body"]) and pd.isna(sent.iloc[0]["format"])
    dropped = _parse(lines, on_error="drop")
    assert len(dropped) == 1 and dropped.iloc[0]["body"] == "fine"


def test_join_partials():
    # reference internal recombine: P lines join until F, combine_with ''
    lines = [
        "2024-04-13T07:59:37.505201169Z stdout P start-",
        "2024-04-13T07:59:38.505201169Z stdout P middle-",
        "2024-04-13T07:59:39.505201169Z stdout F end",
        "2024-04-13T07:59:40.505201169Z stdout F single",
        "2024-04-13T07:59:41.505201169Z stderr P tail-no-final",
    ]
    ds = ray.data.from_arrow(pa.table({
        "text": lines, "line": list(range(len(lines))),
        "src": ["f1"] * len(lines),
    }))
    parsed = ContainerParser(parse_from="text").apply(ds)
    joined = join_partials(parsed, "src", "line").to_pandas().sort_values("line")
    assert list(joined["body"]) == ["start-middle-end", "single", "tail-no-final"]
    assert list(joined["n_lines"]) == [3, 1, 1]
    # first-line ts is kept for the joined row
    assert joined.iloc[0]["event_ts"] == pd.Timestamp("2024-04-13T07:59:37.505201Z")


def test_join_partials_multiblock_no_per_file_frame():
    """One source file spanning many blocks: the P/F join must run on
    the recombine segmented-bypass engine — never the per-group pandas
    path, and never the full segmented merge (which would move every
    segment of the file through one groupby group)."""
    import numpy as np

    from opentelemetry_collector_contrib_ray.stages.recombine import Recombine

    n = 4000
    # one hot file ("big") interleaved with a small one; every 5th
    # line is a P..P F run of 3, the rest are standalone F lines
    tags, bodies = [], []
    for i in range(n):
        if i % 5 == 0:
            tags.append("P"); bodies.append(f"p{i}-")
        elif i % 5 == 1:
            tags.append("P"); bodies.append(f"q{i}-")
        elif i % 5 == 2:
            tags.append("F"); bodies.append(f"end{i}")
        else:
            tags.append("F"); bodies.append(f"solo{i}")
    src = ["big"] * (n - 100) + ["small"] * 100
    tbl = pa.table({
        "src": src, "line": list(range(n)),
        "body": bodies, "logtag": tags,
        "event_ts": pa.array([1_700_000_000_000_000 + i for i in range(n)],
                             pa.timestamp("us", tz="UTC")),
        "log.iostream": ["stdout"] * n,
    })
    ds = ray.data.from_arrow(tbl).repartition(16)

    def boom_group(self, g):
        raise AssertionError("per-group pandas path used")

    def boom_segmented(self, partials):
        raise AssertionError("full segmented merge used (moves every segment)")

    orig_g = Recombine._combine_group
    orig_s = Recombine._merge_partials_segmented
    Recombine._combine_group = boom_group
    Recombine._merge_partials_segmented = boom_segmented
    try:
        got = join_partials(ds, "src", "line").to_pandas()
    finally:
        Recombine._combine_group = orig_g
        Recombine._merge_partials_segmented = orig_s

    got = got.sort_values(["src", "line"]).reset_index(drop=True)
    # oracle: single-threaded numpy recombine
    expect = []
    for s in ("big", "small"):
        rows = [(i, bodies[i], tags[i]) for i in range(n) if src[i] == s]
        buf, first = "", None
        for i, b, t in rows:
            if first is None:
                first = i
            buf += b
            if t != "P":
                expect.append((s, first, buf))
                buf, first = "", None
        if buf:
            expect.append((s, first, buf))
    expect.sort()
    assert len(got) == len(expect)
    assert list(got["src"]) == [e[0] for e in expect]
    assert list(got["line"]) == [e[1] for e in expect]
    assert list(got["body"]) == [e[2] for e in expect]
    # first-line metadata is preserved
    assert got["event_ts"].notna().all()
