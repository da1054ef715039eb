"""Round-2 coverage tests: assignkeys, metricstransform scale,
ParseXML (cases from pkg/ottl/ottlfuncs/func_parse_xml_test.go),
roundrobin split, failover fall-through, servicegraph pairing."""

import json

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data

from opentelemetry_collector_contrib_ray.stages.transform import TransformStage


def _one(tbl, statements):
    return TransformStage(statements, error_mode="propagate").fn(tbl)


def test_assign_keys():
    # transformer/assignkeys: list -> keyed map; wrong-arity rows null
    t = pa.table({"xs": pa.array([[1, 2, 3], [4, 5], [6, 7, 8]], pa.list_(pa.int64()))})
    out = _one(t, [{"editor": "assign_keys",
                    "args": {"target": "m", "src": "xs", "keys": ["a", "b", "c"]}}])
    got = out["m"].to_pylist()
    assert got[0] == {"a": 1, "b": 2, "c": 3}
    assert got[1] is None  # arity mismatch = per-row error
    assert got[2] == {"a": 6, "b": 7, "c": 8}


def test_scale_editor():
    t = pa.table({"v": [1.5, 2.0, None]})
    out = _one(t, [{"editor": "scale", "args": {"target": "v", "factor": 1000.0}}])
    assert out["v"].to_pylist() == [1500.0, 2000.0, None]


def test_parse_xml_reference_cases():
    # func_parse_xml_test.go canonical cases
    cases = {
        "<Log><User><ID>00001</ID><Name>Joe</Name></User><Text>User did a thing</Text></Log>":
            {"tag": "Log", "children": [
                {"tag": "User", "children": [
                    {"tag": "ID", "content": "00001"},
                    {"tag": "Name", "content": "Joe"}]},
                {"tag": "Text", "content": "User did a thing"}]},
        '<HostInfo hostname="example.com" zone="east-1" />':
            {"tag": "HostInfo",
             "attributes": {"hostname": "example.com", "zone": "east-1"}},
        '<?xml version="1.0" encoding="UTF-8" ?><Log>Log content</Log>':
            {"tag": "Log", "content": "Log content"},
        "not xml at all": None,
    }
    t = pa.table({"x": list(cases)})
    out = _one(t, [{"editor": "parse_xml", "args": {"target": "p", "src": "x"}}])
    for got, want in zip(out["p"].to_pylist(), cases.values()):
        assert (json.loads(got) if got is not None else None) == want


def test_round_robin_split():
    from opentelemetry_collector_contrib_ray.stages.reshape import round_robin

    ds = ray.data.range(100)
    parts = round_robin(ds, 4)
    counts = [p.count() for p in parts]
    assert sum(counts) == 100
    assert max(counts) - min(counts) <= 1  # even split


def test_failover_fall_through():
    from opentelemetry_collector_contrib_ray.stages.failover import Failover

    def flaky(b: pa.Table) -> pa.Table:
        # primary rejects the batch containing id 40 (one of 4 blocks)
        if 40 in b["id"].to_pylist():
            raise RuntimeError("primary down")
        return b

    def backup(b: pa.Table) -> pa.Table:
        return b

    ds = ray.data.from_arrow(pa.table({"id": list(range(1, 41))})).repartition(4)
    out = Failover([flaky, backup]).apply(ds).to_pandas()
    assert len(out) == 40  # nothing lost
    assert set(out["failover_level"]) == {0, 1}
    # the failing batch went to the backup; the rest stayed primary
    served_by_backup = set(out[out["failover_level"] == 1]["id"])
    assert 40 in served_by_backup
    assert len(out[out["failover_level"] == 0]) >= 20

    def always_fail(b):
        raise RuntimeError("boom")

    with pytest.raises(Exception):
        Failover([always_fail]).apply(ds).to_pandas()


def test_service_graph_edges_pairing():
    from opentelemetry_collector_contrib_ray.stages.servicegraph import service_graph_edges

    base = np.datetime64("2026-01-01T00:00:00", "us")
    client = ray.data.from_arrow(pa.table({
        "conv_id": ["c1", "c1", "c2", "c3"],
        "match_idx": pa.array([1, 3, 1, 1], pa.int64()),
        "ts": pa.array([base, base + 10, base, base], pa.timestamp("us")),
    }))
    server = ray.data.from_arrow(pa.table({
        "conv_id": ["c1", "c1", "c2", "c9"],
        "match_idx": pa.array([1, 3, 1, 1], pa.int64()),
        "tool": ["search", "bash", "search", "editor"],
        "ts": pa.array([base + 1_000_000, base + 2_000_010, base + 500_000,
                        base], pa.timestamp("us")),
    }))
    out = service_graph_edges(client, server, on=["conv_id", "match_idx"],
                              edge_dims=["tool"], num_partitions=2,
                              guard_empty=True).to_pandas()
    out = out.set_index("tool")
    assert out.loc["search", "n_calls"] == 2
    assert out.loc["search", "latency_us_sum"] == 1_000_000 + 500_000
    assert out.loc["bash", "n_calls"] == 1
    assert out.loc["bash", "latency_us_sum"] == 2_000_000
    assert "editor" not in out.index  # unmatched server span pairs nothing


def test_genai_normalizer():
    from opentelemetry_collector_contrib_ray.stages.genai import genai_normalizer

    t = pa.table({
        "llm.request.model": ["gpt-x", None, "m3"],
        "llm.usage.prompt_tokens": pa.array([10, 20, None], pa.int64()),
        # pre-existing target value must survive (overwrite=False)
        "gen_ai.request.model": [None, "already-set", None],
        "op": ["completion", "chat", "embedding"],
    })
    stage = genai_normalizer([
        {"name": "openllmetry", "remove_originals": True},
        {"name": "ops", "mappings": {"op": "gen_ai.operation.name"},
         "value_mappings": {"gen_ai.operation.name": {"completion": "chat"}}},
    ])
    out = stage.fn(t)
    assert out["gen_ai.request.model"].to_pylist() == ["gpt-x", "already-set", "m3"]
    assert out["gen_ai.usage.input_tokens"].to_pylist() == [10, 20, None]
    assert "llm.request.model" not in out.column_names  # remove_originals
    assert out["gen_ai.operation.name"].to_pylist() == ["chat", "chat", "embedding"]

    # built-in sources reject custom mappings (README Source table)
    with pytest.raises(ValueError):
        genai_normalizer([{"name": "openllmetry", "mappings": {"a": "b"}}])


def test_arith_editor():
    from opentelemetry_collector_contrib_ray.expr import col as C

    t = pa.table({"a": [10.0, 6.0, 1.0], "b": [2.0, 0.0, 4.0]})
    out = _one(t, [
        {"editor": "arith", "args": {"target": "r", "op": "div", "a": C("a"), "b": C("b")}},
        {"editor": "arith", "args": {"target": "s", "op": "add", "a": C("a"), "b": C("b")}},
        {"editor": "arith", "args": {"target": "m", "op": "mul", "a": C("a"), "b": 3.0}},
    ])
    assert out["r"].to_pylist() == [5.0, None, 0.25]  # div-by-zero -> null
    assert out["s"].to_pylist() == [12.0, 6.0, 5.0]
    assert out["m"].to_pylist() == [30.0, 18.0, 3.0]


def test_multimodal_resize_and_frame_sample():
    from opentelemetry_collector_contrib_ray.stages.multimodal import (
        FAKE_DECODE_SHAPE,
        decode_images,
        resize_images,
        sample_frames,
        synth_binary_table,
    )

    tbl = synth_binary_table(50)
    ds = ray.data.from_arrow(tbl).repartition(2)
    decoded = decode_images(ds)
    resized = resize_images(decoded, out_h=4, out_w=4).to_pandas()
    h, w, c = FAKE_DECODE_SHAPE
    assert all(len(p) == 4 * 4 * c for p in resized["pixels_small"])
    # nearest-neighbor: the (0,0) output pixel equals the (0,0) input pixel
    assert all(p[0] == q[0] for p, q in zip(resized["pixels_small"], resized["pixels"]))

    frames = sample_frames(ray.data.from_arrow(tbl), frame_bytes=64, every_k=4).to_pandas()
    for raw, fs, nf in zip(tbl["data"].to_pylist(), frames["frames"], frames["n_sampled_frames"]):
        total = len(raw) // 64
        want = [raw[j * 64:(j + 1) * 64] for j in range(0, total, 4)]
        assert [bytes(x) for x in fs] == want
        assert nf == len(want)


def test_png_codec_known_pixels(ray_session):
    # round-4: the multimodal decode stub is now a REAL stdlib PNG
    # codec — known pixel values round-trip through the actor stage
    import numpy as np
    import pyarrow as pa
    import ray.data

    from opentelemetry_collector_contrib_ray.stages.multimodal import (
        PngDecode,
        decode_png_images,
        png_decode,
        png_encode,
    )

    # hand-built 2x2 RGB: exact known bytes and pixels
    img = np.array([[[255, 0, 0], [0, 255, 0]],
                    [[0, 0, 255], [10, 20, 30]]], dtype=np.uint8)
    data = png_encode(img)
    assert data[:8] == b"\x89PNG\r\n\x1a\n"
    px, h, w, c = png_decode(data)
    assert (h, w, c) == (2, 2, 3)
    assert (px == img).all()

    # grey + RGBA shapes
    for shape in [(3, 5, 1), (4, 4, 4)]:
        a = np.random.default_rng(1).integers(0, 256, shape, dtype=np.uint8)
        px, *dims = png_decode(png_encode(a))
        assert tuple(dims) == shape and (px == a).all()

    # batch stage: pixels column carries the exact tensor; malformed
    # payloads yield null rows (fail-soft) or raise (on_error='raise')
    t = pa.table({"item_id": [0, 1], "data": [data, b"junk"]})
    out = PngDecode()(t)
    assert out["pixels"][0].as_py() == list(img.reshape(-1))
    assert out["mean_intensity"][0].as_py() == float(img.mean())
    assert out["height"][1].as_py() is None
    import pytest

    with pytest.raises(ValueError):
        PngDecode(on_error="raise")(t)

    # through the Dataset actor-pool wiring
    ds = ray.data.from_arrow(pa.table({"item_id": [7], "data": [data]}))
    row = decode_png_images(ds, batch_size=8, concurrency=(1, 2)).take_all()[0]
    assert row["width"] == 2 and row["channels"] == 3
