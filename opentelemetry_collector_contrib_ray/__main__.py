"""Run a collector-style YAML config:

    python -m opentelemetry_collector_contrib_ray <config.yaml>

Executes every service pipeline that has exporters and prints the
output paths (the engine-level analog of running the reference
collector binary with --config).
"""

from __future__ import annotations

import sys


def main(argv: list[str] | None = None) -> int:
    argv = sys.argv[1:] if argv is None else argv
    if len(argv) != 1:
        print(__doc__, file=sys.stderr)
        return 2
    import ray

    from .pipelines.config import collector_from_yaml

    if not ray.is_initialized():
        ray.init(address="local", include_dashboard=False,
                 logging_level="ERROR")
    try:
        for name, pipe in collector_from_yaml(argv[0]).items():
            if pipe._writers:
                print(name, "->", pipe.run())
    finally:
        ray.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
