"""Generate the demo span table for collector_traces.yaml."""

import os

import pyarrow as pa
import pyarrow.parquet as pq

rows = []
for tid, n, step_us, svc in [("slow-trace", 5, 60_000_000, "checkout"),
                             ("fast-trace", 4, 1_000_000, "search"),
                             ("slow-search", 3, 80_000_000, "search")]:
    for i in range(n):
        rows.append((tid, i * step_us, svc, 40.0 + 10 * i))

os.makedirs("/tmp/demo_spans", exist_ok=True)
pq.write_table(pa.table({
    "trace_id": [r[0] for r in rows],
    "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
    "svc": [r[2] for r in rows],
    "dur": [r[3] for r in rows],
}), "/tmp/demo_spans/spans.parquet")
print("wrote /tmp/demo_spans/spans.parquet")
