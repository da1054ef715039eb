"""Generate the demo log files for collector_logs.yaml."""

import os

LINES = [
    "2024-05-01T10:00:00.000Z INFO service started",
    "2024-05-01T10:00:01.500Z DEBUG connection pool sized",
    "2024-05-01T10:00:02.000Z ERROR upstream timeout",
    "  retrying in 2s",              # multiline continuation (no ts prefix)
    "  giving up after 3 attempts",
    "2024-05-01T10:00:05.250Z WARN queue depth high",
    "2024-05-01T10:00:06.000Z INFO request served",
]

os.makedirs("/tmp/demo_logs", exist_ok=True)
for i in range(2):
    path = f"/tmp/demo_logs/app-{i}.log"
    with open(path, "w") as f:
        f.write("\n".join(LINES) + "\n")
    print("wrote", path)
