"""Generate the demo metric table for collector_metrics.yaml."""

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

rng = np.random.default_rng(5)
n = 2000
metrics = np.array(["cpu.util", "mem.used", "debug.probe"])[rng.integers(0, 3, n)]
hosts = np.array([f"host{i}" for i in range(4)])[rng.integers(0, 4, n)]
cores = np.array(["0", "1"])[rng.integers(0, 2, n)]

os.makedirs("/tmp/demo_metrics", exist_ok=True)
pq.write_table(pa.table({
    "metric": metrics,
    "host": hosts,
    "core": cores,
    "value": np.round(rng.random(n) * 100, 3),
}), "/tmp/demo_metrics/metrics.parquet")
print("wrote /tmp/demo_metrics/metrics.parquet")
