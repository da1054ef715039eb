"""Mid-run kill -> resume stress for the flagship pipeline's
per-partition lineage (the north rule's resumability criterion).

Three phases, each in a FRESH process so object-store / executor state
cannot leak between them:

  1. clean   — run_flagship end-to-end into out/clean (N partitions);
  2. killed  — the same job into out/killed, SIGKILLed from the parent
               partway through (after the first manifest commits land
               but well before completion);
  3. resumed — rerun into out/killed: committed partitions must be
               SKIPPED (their manifest entries + routed files predate
               the rerun), the rest recomputed, orphans swept, and the
               final metric outputs must be value-identical to clean's.

Usage: python tools/stress_resume.py [sf_dir_or_sf] [partitions]
Prints one JSON line with wall times, skip counts and the equality
verdict.
"""

from __future__ import annotations

import glob
import json
import os
import shutil
import signal
import subprocess
import sys
import time

OUT_ROOT = "/tmp/flagship_resume_demo"

_CHILD = r"""
import sys, ray
ray.init(address="local", num_cpus=%(cpus)d, include_dashboard=False,
         logging_level="ERROR")
from ray.data import DataContext
DataContext.get_current().enable_progress_bars = False
from opentelemetry_collector_contrib_ray.pipelines.flagship import run_flagship
run_flagship(%(sf)r, %(out)r, partitions=%(parts)d)
ray.shutdown()
"""


def _run_child(sf, out, parts, cpus, kill_at_committed=None):
    p = subprocess.Popen(
        [sys.executable, "-c", _CHILD % dict(sf=sf, out=out, parts=parts,
                                             cpus=cpus)],
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL,
    )
    t0 = time.perf_counter()
    if kill_at_committed is None:
        p.wait()
        return time.perf_counter() - t0, False
    # kill as soon as kill_at_committed partition manifests have
    # landed — mid-run by construction: at least one partition is
    # committed (so the skip assertion is meaningful) and, provided
    # kill_at_committed < partitions, later partitions are still
    # outstanding (so the resume actually recomputes work)
    mdir = os.path.join(out, "_manifest")
    while p.poll() is None:
        time.sleep(0.1)
        committed = len(glob.glob(os.path.join(mdir, "part-*.json"))) \
            if os.path.isdir(mdir) else 0
        if committed >= kill_at_committed:
            p.send_signal(signal.SIGKILL)
            p.wait()
            return time.perf_counter() - t0, True
    return time.perf_counter() - t0, False


def _metric_values(out):
    import pyarrow.parquet as pq

    vals = {}
    for d in sorted(glob.glob(os.path.join(out, "metrics", "*"))):
        t = pq.read_table(d)
        df = t.to_pandas().sort_values(list(t.column_names)).reset_index(drop=True)
        vals[os.path.basename(d)] = df
    return vals


def main():
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    parts = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    cpus = int(os.environ.get("RAY_GRAFT_CPUS", "32"))

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from opentelemetry_collector_contrib_ray.pipelines.flagship import (
        committed_files,
        sweep_orphans,
    )
    from opentelemetry_collector_contrib_ray.sources.transcripts import (
        ensure_transcripts,
    )
    from opentelemetry_collector_contrib_ray.state.manifest import Manifest

    sf_dir = ensure_transcripts(sf)
    shutil.rmtree(OUT_ROOT, ignore_errors=True)
    clean_out = os.path.join(OUT_ROOT, "clean")
    killed_out = os.path.join(OUT_ROOT, "killed")

    clean_s, _ = _run_child(sf_dir, clean_out, parts, cpus)

    # kill once ~25% of partitions have committed (mid-run by
    # construction; the rest are still outstanding)
    killed_s, was_killed = _run_child(sf_dir, killed_out, parts, cpus,
                                      kill_at_committed=max(1, parts // 4))
    assert was_killed, "job finished before the kill fired — raise partitions"

    man = Manifest(killed_out)
    done_before = {k for k in man.entries() if k.startswith("part-")}
    # a committed partition must be SKIPPED by the resume: its manifest
    # entry file is never rewritten
    entry_mtimes = {k: os.path.getmtime(man._key_path(k)) for k in done_before}
    # every routed file already published at kill time (incl. files
    # from partitions whose tasks finished but whose partition never
    # committed) — a resume may overwrite those, but only IDEMPOTENTLY
    import hashlib

    def _md5(path):
        h = hashlib.md5()
        with open(path, "rb") as f:
            for chunk in iter(lambda: f.read(1 << 20), b""):
                h.update(chunk)
        return h.hexdigest()

    pre = {f: (_md5(f), os.path.getmtime(f))
           for f in glob.glob(os.path.join(killed_out, "routed", "sink=*", "*.parquet"))
           if f in committed_files(os.path.join(killed_out, "routed"))}

    resume_s, _ = _run_child(sf_dir, killed_out, parts, cpus)

    orphans = sweep_orphans(os.path.join(killed_out, "routed"))
    man2 = Manifest(killed_out)
    done_after = {k for k in man2.entries() if k.startswith("part-")}

    skipped = {k for k in done_before
               if os.path.getmtime(man2._key_path(k)) == entry_mtimes[k]}
    rewritten = {f for f, (h, m) in pre.items() if os.path.getmtime(f) != m}
    # overwrites must reproduce identical bytes (deterministic block id
    # + content -> same file, same parquet bytes)
    non_idempotent = {f for f in rewritten if _md5(f) != pre[f][0]}
    preserved = len(pre) - len(rewritten)
    # metric equality clean vs killed+resumed
    a, b = _metric_values(clean_out), _metric_values(killed_out)
    metrics_equal = set(a) == set(b) and all(a[k].equals(b[k]) for k in a)

    # routed-row equality per sink (committed files only)
    import pyarrow.parquet as pq

    def sink_rows(out):
        good = committed_files(os.path.join(out, "routed"))
        rows = {}
        for f in sorted(good):
            s = os.path.basename(os.path.dirname(f)).split("=", 1)[1]
            rows[s] = rows.get(s, 0) + pq.read_metadata(f).num_rows
        return rows

    ra, rb = sink_rows(clean_out), sink_rows(killed_out)

    print(json.dumps({
        "sf_dir": sf_dir, "partitions": parts, "num_cpus": cpus,
        "clean_sec": round(clean_s, 2),
        "killed_after_sec": round(killed_s, 2),
        "resume_sec": round(resume_s, 2),
        "partitions_committed_at_kill": len(done_before),
        "partitions_skipped_by_resume": len(skipped),
        "partitions_after_resume": len(done_after),
        "published_files_at_kill": len(pre),
        "files_preserved_untouched": preserved,
        "files_overwritten_idempotently": len(rewritten) - len(non_idempotent),
        "files_overwritten_DIFFERENT": len(non_idempotent),
        "orphans_swept": len(orphans),
        "metrics_equal_clean_vs_resumed": bool(metrics_equal),
        "sink_rows_clean": ra, "sink_rows_resumed": rb,
        "sink_rows_equal": ra == rb,
    }))
    ok = (metrics_equal and ra == rb and not non_idempotent
          and skipped == done_before and len(done_before) >= 1
          and preserved >= 1 and len(done_after) == parts)
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
