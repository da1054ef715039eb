"""End-to-end flagship conformance: fused single-pass outputs vs the
row-at-a-time oracle, plus partition-level resume."""

import glob
import os

import pyarrow.parquet as pq
import pytest

from opentelemetry_collector_contrib_ray.pipelines.flagship import run_flagship
from opentelemetry_collector_contrib_ray.sources.transcripts import generate_transcripts
from tests.test_route_agg import oracle_metrics, oracle_route

SF = "/root/testdata/sf0.001"  # -> deterministic 1000-row transcripts


@pytest.fixture(scope="module")
def out_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("flagship")
    run_flagship(SF, str(root), partitions=2)
    return str(root)


@pytest.fixture(scope="module")
def table():
    return generate_transcripts(1000)


def test_metrics_match_oracle(out_root, table):
    counts, sums = oracle_metrics(table.to_pylist())

    tc = pq.read_table(os.path.join(out_root, "metrics", "turn_count")).to_pylist()
    got = {(r["role"], r["tool"], r["hour"]): r["turn_count"] for r in tc}
    assert got == dict(counts["turn_count"])

    ec = pq.read_table(os.path.join(out_root, "metrics", "error_count")).to_pylist()
    got = {(r["role"], r["hour"]): r["error_count"] for r in ec}
    assert got == dict(counts["error_count"])

    dsum = pq.read_table(os.path.join(out_root, "metrics", "dur_sum")).to_pylist()
    got = {(r["role"], r["tool"], r["hour"]): r["dur_sum"] for r in dsum}
    assert got == dict(sums)


def test_routed_rows_match_oracle(out_root, table):
    want = sorted(oracle_route(table.to_pylist()))
    got = []
    for d in glob.glob(os.path.join(out_root, "routed", "sink=*")):
        sink = d.split("sink=")[-1]
        for f in glob.glob(os.path.join(d, "*.parquet")):
            t = pq.read_table(f, columns=["conv_id", "turn_idx"])
            got += [(c, i, sink) for c, i in zip(t["conv_id"].to_pylist(), t["turn_idx"].to_pylist())]
    assert sorted(got) == want


def test_sink_text_equality_under_order(out_root, table):
    """North-rule F5: per-turn text byte-equality under (conv_id,
    turn_idx) ordering, per sink."""
    by_key = {(r["conv_id"], r["turn_idx"]): r["text"] for r in table.to_pylist()}
    for d in glob.glob(os.path.join(out_root, "routed", "sink=*")):
        rows = []
        for f in glob.glob(os.path.join(d, "*.parquet")):
            t = pq.read_table(f, columns=["conv_id", "turn_idx", "text"])
            rows += t.to_pylist()
        rows.sort(key=lambda r: (r["conv_id"], r["turn_idx"]))
        for r in rows:
            assert r["text"] == by_key[(r["conv_id"], r["turn_idx"])]


def test_part_manifests_cover_all_files(out_root):
    listed = set()
    for mf in glob.glob(os.path.join(out_root, "routed", "_parts", "*.json")):
        import json

        with open(mf) as f:
            for e in json.load(f)["files"]:
                listed.add(e["file"])
    on_disk = set(glob.glob(os.path.join(out_root, "routed", "sink=*", "*.parquet")))
    assert on_disk == listed  # write-audit-publish: no orphans in a clean run


def test_resume_skips_done_partitions(out_root):
    n_files_before = len(glob.glob(os.path.join(out_root, "routed", "sink=*", "*.parquet")))
    entries = run_flagship(SF, out_root, partitions=2)
    n_files_after = len(glob.glob(os.path.join(out_root, "routed", "sink=*", "*.parquet")))
    assert n_files_after == n_files_before  # nothing rewritten
    # sf0.001 is a single input file -> one partition
    assert {k for k in entries} >= {"part-00000", "metrics:turn_count"}


def test_multi_partition_resume(tmp_path):
    """Partition-level lineage: re-running after deleting ONE
    partition's manifest entry recomputes only that partition."""
    import json

    import pyarrow.parquet as pqt

    # two-file input dir
    tbl = generate_transcripts(2000)
    src = tmp_path / "input"
    src.mkdir()
    pqt.write_table(tbl.slice(0, 1000), str(src / "part-00000.parquet"))
    pqt.write_table(tbl.slice(1000, 1000), str(src / "part-00001.parquet"))

    out = str(tmp_path / "out")
    entries = run_flagship(str(src), out, partitions=2)
    assert "part-00000" in entries and "part-00001" in entries

    files_before = {f: os.path.getmtime(f)
                    for f in glob.glob(os.path.join(out, "routed", "sink=*", "*.parquet"))}

    # drop one partition's commit (per-key entry files); rerun
    from opentelemetry_collector_contrib_ray.state.manifest import Manifest

    man = Manifest(out)
    assert man.is_done("part-00001")
    os.remove(man._key_path("part-00001"))
    os.remove(man._key_path("metrics:turn_count"))
    run_flagship(str(src), out, partitions=2)

    changed = {f for f, m in files_before.items()
               if os.path.getmtime(f) != m}
    # only files written by partition 1's tasks were rewritten; verify
    # by checking some files survived untouched (partition 0's)
    assert changed  # partition 1 rewrote idempotently
    assert len(changed) < len(files_before)
    # row totals unchanged after resume (idempotent overwrite)
    total = sum(pqt.read_metadata(f).num_rows
                for f in glob.glob(os.path.join(out, "routed", "sink=*", "*.parquet")))
    want = sum(1 for _ in oracle_route(tbl.to_pylist()))
    assert total == want


def test_orphan_sweep(tmp_path):
    """Write-audit-publish: files outside the part-manifests are
    orphans; sweep_orphans removes exactly them."""
    from opentelemetry_collector_contrib_ray.pipelines.flagship import (
        committed_files,
        sweep_orphans,
    )

    out = str(tmp_path / "o")
    run_flagship(SF, out)
    routed = os.path.join(out, "routed")
    good = committed_files(routed)
    assert good == set(glob.glob(os.path.join(routed, "sink=*", "*.parquet")))

    orphan = os.path.join(routed, "sink=errors", "part-deadbeef.parquet")
    with open(orphan, "wb") as f:
        f.write(b"not a real parquet")
    removed = sweep_orphans(routed)
    assert removed == [orphan]
    assert not os.path.exists(orphan)


def test_giant_file_splits_into_row_group_tasks(ray_session, tmp_path):
    """One input file >> the others must NOT serialize the stage
    behind a single task: read parallelism is one block per parquet
    ROW GROUP (r4 VERDICT skew hazard #2)."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq
    import ray.data

    from opentelemetry_collector_contrib_ray.pipelines.flagship import (
        _row_group_blocks,
    )

    big = pa.table({"conv_id": [f"c{i % 50:04d}" for i in range(200_000)],
                    "turn_idx": pa.array(np.arange(200_000) % 4000),
                    "x": pa.array(np.arange(200_000))})
    pq.write_table(big, str(tmp_path / "big.parquet"), row_group_size=25_000)
    for j in range(3):
        small = pa.table({"conv_id": [f"s{j}"] * 10,
                          "turn_idx": pa.array(np.arange(10)),
                          "x": pa.array(np.arange(10))})
        pq.write_table(small, str(tmp_path / f"small{j}.parquet"))
    files = sorted(str(p) for p in tmp_path.glob("*.parquet"))
    nb = _row_group_blocks(files)
    assert nb == 8 + 3  # 8 row groups in the giant file + 3 singles
    ds = ray.data.read_parquet(files, override_num_blocks=nb).materialize()
    # the giant file yields MULTIPLE blocks (>=8 of the total)
    assert ds.num_blocks() >= nb
    assert ds.count() == 200_030
