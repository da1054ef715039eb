"""Run a collector-style YAML config through the engine.

Usage: python examples/run_collector.py <config.yaml>
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import ray

from opentelemetry_collector_contrib_ray.pipelines.config import collector_from_yaml


def main() -> None:
    if not ray.is_initialized():
        # no explicit address: honors RAY_ADDRESS (ray job submit /
        # sandbox) and falls back to a local session otherwise
        ray.init(include_dashboard=False, logging_level="ERROR")
    pipes = collector_from_yaml(sys.argv[1])
    for name, pipe in pipes.items():
        if pipe._writers:
            print(name, "->", pipe.run())
    ray.shutdown()


if __name__ == "__main__":
    main()
