"""Ray-Data-native log/telemetry processing engine.

A from-scratch reimplementation of the query/data-processing
capabilities of open-telemetry/opentelemetry-collector-contrib
(stanza operators, OTTL transforms, routing/count/sum connectors,
lookup enrichment) expressed as ``ray.data.Dataset`` pipelines over
zero-copy Arrow batches, plus the large-scale training-data operators
(dedup, similarity search, text analysis) such an engine needs at
100 TB scale.

Architecture (see SURVEY.md):
  sources/    deterministic synthetic transcript + lookup tables, readers
  functions/  vectorized kernels (severity maps, hashing, strings, time)
  stages/     pipeline stages: parse, transform, enrich, route, aggregate,
              recombine, sample, dedup, similarity, textstats, sessionize
  state/      per-partition manifest checkpointing
  pipelines/  end-to-end composed pipelines (flagship parse->enrich->
              route->aggregate)

Nothing in this package calls ``ray.init``/``ray.shutdown`` — the
driver, bench.py and the test fixture own the Ray session.
"""

__version__ = "0.1.0"
