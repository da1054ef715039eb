"""Job entrypoints (the engine-level analog of running the reference
collector binary with --config):

    python -m opentelemetry_collector_contrib_ray <config.yaml>
    python -m opentelemetry_collector_contrib_ray flagship <input_dir> <out_root>

Both work unchanged under cluster submission, which is how the engine
runs on a real fixed-size Ray cluster:

    ray job submit --working-dir . -- \
        python -m opentelemetry_collector_contrib_ray flagship \
        s3://bucket/transcripts /out/run1

``ray.init()`` resolves the address from the environment (RAY_ADDRESS,
which the job server sets inside a submitted job; the sandbox presets
it to "local"), so the same command drives one laptop or 256 nodes.
The flagship run is resumable: re-submitting with the same out_root
skips partitions already committed to the manifest.
"""

from __future__ import annotations

import sys


def _init_ray() -> None:
    import ray

    if not ray.is_initialized():
        # no explicit address: honors RAY_ADDRESS (job submission /
        # sandbox) and falls back to a local session otherwise
        ray.init(include_dashboard=False, logging_level="ERROR")


def main(argv: list[str] | None = None) -> int:
    argv = sys.argv[1:] if argv is None else argv
    import ray

    if len(argv) == 3 and argv[0] == "flagship":
        from .pipelines.flagship import run_flagship

        _init_ray()
        try:
            entries = run_flagship(argv[1], argv[2])
            for name, e in sorted(entries.items()):
                m = e.get("metrics") or {}
                print(name, "->", e["output"],
                      f"rows={m.get('rows', '-')}", f"wall={m.get('wall_sec')}s")
        finally:
            ray.shutdown()
        return 0
    if len(argv) != 1:
        print(__doc__, file=sys.stderr)
        return 2

    from .pipelines.config import collector_from_yaml

    _init_ray()
    try:
        for name, pipe in collector_from_yaml(argv[0]).items():
            if pipe._writers:
                print(name, "->", pipe.run())
    finally:
        ray.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
