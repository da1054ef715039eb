"""aws_ecs_attributes container-ID resolution + attribute-allowlist
semantics (processor/awsecsattributesprocessor config.go Validate +
README Configuration)."""

import pyarrow as pa
import pytest
import ray.data

from opentelemetry_collector_contrib_ray.stages.awsecs import AwsEcsAttributes

CID_A = "a" * 64
CID_B = "0123456789abcdef" * 4

SNAPSHOT = pa.table({
    "container.id": [CID_A, CID_B],
    "aws.ecs.task.arn": ["arn:aws:ecs:us-east-1:1:task/t1",
                         "arn:aws:ecs:us-east-1:1:task/t2"],
    "aws.ecs.cluster": ["c1", "c2"],
    "docker.name": ["/web", "/db"],
    "image.tag": ["v1", "v2"],
})


def _run(rows, **kw):
    ds = ray.data.from_arrow(pa.table(rows))
    return AwsEcsAttributes(SNAPSHOT, **kw).apply(ds).to_pandas()


def test_first_nonempty_source_wins_and_miss_adds_nothing():
    out = _run(
        {"container.id": ["", CID_A, "f" * 64],
         "log.file.name": [CID_B, CID_B, ""]},
        sources=["container.id", "log.file.name"])
    # row 0: container.id empty -> falls to log.file.name (CID_B)
    # row 1: container.id non-empty and wins over log.file.name
    # row 2: resolved ID unknown -> no metadata attached
    assert list(out["aws.ecs.cluster"].fillna("-")) == ["c2", "c1", "-"]


def test_hex64_extracted_from_log_path():
    path = f"/var/lib/docker/containers/{CID_A}/{CID_A}-json.log"
    out = _run({"log.file.name": [path]}, sources=["log.file.name"])
    assert list(out["docker.name"]) == ["/web"]


def test_attributes_regex_allowlist():
    out = _run({"container.id": [CID_A]},
               sources=["container.id"],
               attributes=[r"^aws\.ecs.*"])
    assert "aws.ecs.cluster" in out.columns
    assert "aws.ecs.task.arn" in out.columns
    assert "docker.name" not in out.columns and "image.tag" not in out.columns


def test_config_validation_matches_reference():
    # config.go:48-50 — at least one source
    with pytest.raises(ValueError, match="at least one container ID"):
        AwsEcsAttributes(SNAPSHOT, sources=[])
    # config.go:53-55 — cache_ttl >= 60
    with pytest.raises(ValueError, match="cache_ttl"):
        AwsEcsAttributes(SNAPSHOT, sources=["container.id"], cache_ttl=30)
    # config.go:58-62 — attributes patterns must compile
    with pytest.raises(ValueError, match="invalid expression"):
        AwsEcsAttributes(SNAPSHOT, sources=["container.id"],
                         attributes=["(["])


def test_yaml_wiring(ray_session, tmp_path):
    # README example config shape through collector_from_yaml
    import pyarrow.parquet as pq_

    from opentelemetry_collector_contrib_ray.pipelines.config import (
        collector_from_yaml,
    )

    snapp = str(tmp_path / "ecs.parquet")
    pq_.write_table(SNAPSHOT, snapp)
    log = tmp_path / "ecs.log"
    log.write_text(f"m1 {CID_A}\nm2 {CID_B}\nm3 {'9' * 64}\n")
    pipes = collector_from_yaml(f"""
receivers:
  filelog:
    include: ["{log}"]
    operators:
      - type: regex_parser
        parse_from: line
        regex: '^(?P<msg>\\w+) (?P<cid>[0-9a-f]+)'
      - type: transform
        statements:
          - 'set(attributes["container.id"], cid)'
processors:
  aws_ecs_attributes:
    snapshot:
      path: {snapp}
    container_id:
      sources:
        - "container.id"
        - "log.file.name"
    attributes:
      - '^aws.ecs.*'
      - '^docker.*'
    cache_ttl: 300
service:
  pipelines:
    logs:
      receivers: [filelog]
      processors: [aws_ecs_attributes]
      exporters: []
""")
    df = pipes["logs"].dataset().to_pandas().sort_values("msg")
    assert list(df["aws.ecs.cluster"].fillna("-")) == ["c1", "c2", "-"]
    assert list(df["docker.name"].fillna("-")) == ["/web", "/db", "-"]
    assert "image.tag" not in df.columns
