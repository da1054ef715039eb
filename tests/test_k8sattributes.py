"""k8sattributes pod-association + extract semantics, porting the
reference's pod_association_test.go cases onto the columnar engine
(processor/k8sattributesprocessor)."""

import pyarrow as pa
import ray.data

from opentelemetry_collector_contrib_ray.stages.k8sattributes import K8sAttributes

SNAPSHOT = pa.table({
    "k8s.pod.ip": ["1.2.3.4", "10.1.2.3", "10.9.9.9"],
    "k8s.pod.name": ["pod-a", "pod-b", "pod-c"],
    "k8s.namespace.name": ["ns1", "ns1", "ns2"],
    "k8s.pod.uid": ["u-a", "u-b", "u-c"],
    "k8s.node.name": ["n1", "n1", "n2"],
    "label.app": ["web", "db", "web"],
    "annotation.team": ["core", "infra", "core"],
    "namespace.label.env": ["prod", "prod", "dev"],
})


def _run(rows, **kw):
    ds = ray.data.from_arrow(pa.table(rows))
    return K8sAttributes(SNAPSHOT, **kw).apply(ds).to_pandas()


def test_skips_non_ip_host_name_association():
    # pod_association_test.go TestExtractPodIDSkipsNonIPHostNameAssociation:
    # a non-IP host.name does not resolve -> no pod, no metadata
    out = _run({"host.name": ["k8s-node-1"]},
               pod_association=[{"sources": [
                   {"from": "resource_attribute", "name": "host.name"}]}],
               metadata=["k8s.pod.name"])
    assert out["k8s.pod.name"].isna().all()


def test_falls_back_when_host_name_is_not_ip():
    # TestExtractPodIDFallsBackWhenHostNameIsNotIP: the unresolved
    # host.name association falls through to the connection source
    out = _run({"host.name": ["worker-node"], "connection": ["1.2.3.4"]},
               pod_association=[
                   {"sources": [{"from": "resource_attribute",
                                 "name": "host.name"}]},
                   {"sources": [{"from": "connection"}]},
               ],
               metadata=["k8s.pod.name", "k8s.pod.uid"])
    assert list(out["k8s.pod.name"]) == ["pod-a"]
    assert list(out["k8s.pod.uid"]) == ["u-a"]


def test_keeps_host_name_when_value_is_ip():
    # TestExtractPodIDKeepsHostNameWhenValueIsIP
    out = _run({"host.name": ["10.1.2.3"]},
               pod_association=[{"sources": [
                   {"from": "resource_attribute", "name": "host.name"}]}],
               metadata=["k8s.pod.name"])
    assert list(out["k8s.pod.name"]) == ["pod-b"]


def test_first_resolved_association_is_final_even_on_miss():
    # pod_association.go:60-63 — the first association whose sources
    # ALL resolve provides the identifier; a lookup MISS does not fall
    # through to the next association
    out = _run({"k8s.pod.ip": ["7.7.7.7"],       # resolves, no such pod
                "k8s.pod.name": ["pod-b"],
                "k8s.namespace.name": ["ns1"]},  # would match if reached
               pod_association=[
                   {"sources": [{"from": "resource_attribute",
                                 "name": "k8s.pod.ip"}]},
                   {"sources": [{"from": "resource_attribute",
                                 "name": "k8s.pod.name"},
                                {"from": "resource_attribute",
                                 "name": "k8s.namespace.name"}]},
               ],
               metadata=["k8s.pod.uid"])
    assert out["k8s.pod.uid"].isna().all()


def test_composite_name_namespace_association_and_extract_rules():
    # README pod_association example 2 (name + namespace pair) plus
    # labels/annotations extract rules ({tag_name, key, from})
    out = _run({
        "k8s.pod.name": ["pod-c", "pod-b", ""],
        "k8s.namespace.name": ["ns2", "ns1", "ns1"],
    },
        pod_association=[{"sources": [
            {"from": "resource_attribute", "name": "k8s.pod.name"},
            {"from": "resource_attribute", "name": "k8s.namespace.name"}]}],
        metadata=["k8s.node.name"],
        labels=[{"tag_name": "app", "key": "app", "from": "pod"},
                {"tag_name": "env", "key": "env", "from": "namespace"}],
        annotations=[{"tag_name": "team", "key": "team", "from": "pod"}])
    assert list(out["k8s.node.name"].fillna("-")) == ["n2", "n1", "-"]
    assert list(out["app"].fillna("-")) == ["web", "db", "-"]
    assert list(out["env"].fillna("-")) == ["dev", "prod", "-"]
    assert list(out["team"].fillna("-")) == ["core", "infra", "-"]


def test_default_association_is_pod_ip():
    # extractPodIDNoAssociations: default identifier is k8s.pod.ip
    out = _run({"k8s.pod.ip": ["10.9.9.9", "0.0.0.1"]},
               metadata=["k8s.pod.name"])
    assert list(out["k8s.pod.name"].fillna("-")) == ["pod-c", "-"]


def test_yaml_wiring(ray_session, tmp_path):
    # the collector_from_yaml k8sattributes processor (README shape)
    import pyarrow.parquet as pq_

    from opentelemetry_collector_contrib_ray.pipelines.config import (
        collector_from_yaml,
    )

    snapp = str(tmp_path / "pods.parquet")
    pq_.write_table(SNAPSHOT, snapp)
    log = tmp_path / "k.log"
    log.write_text("m1 1.2.3.4\nm2 10.9.9.9\nm3 5.5.5.5\n")
    pipes = collector_from_yaml(f"""
receivers:
  filelog:
    include: ["{log}"]
    operators:
      - type: regex_parser
        parse_from: line
        regex: '^(?P<msg>\\w+) (?P<pod_ip>[\\d\\.]+)'
      - type: transform
        statements:
          - 'set(attributes["k8s.pod.ip"], pod_ip)'
processors:
  k8sattributes:
    snapshot:
      path: {snapp}
    pod_association:
      - sources:
          - from: resource_attribute
            name: k8s.pod.ip
    extract:
      metadata: [k8s.pod.name, k8s.namespace.name]
      labels:
        - tag_name: app
          key: app
          from: pod
service:
  pipelines:
    logs:
      receivers: [filelog]
      processors: [k8sattributes]
      exporters: []
""")
    df = pipes["logs"].dataset().to_pandas().sort_values("msg")
    assert list(df["k8s.pod.name"].fillna("-")) == ["pod-a", "pod-c", "-"]
    assert list(df["app"].fillna("-")) == ["web", "web", "-"]


def test_extract_node_and_owner_metadata():
    # config.go:86 From choices beyond pod/namespace: node/deployment
    # (owner metadata denormalized onto the pod snapshot row)
    snap = pa.table({
        "k8s.pod.ip": ["1.2.3.4"],
        "k8s.pod.name": ["pod-a"],
        "k8s.namespace.name": ["ns1"],
        "k8s.pod.uid": ["u-a"],
        "k8s.node.name": ["n1"],
        "label.app": ["web"],
        "annotation.team": ["core"],
        "namespace.label.env": ["prod"],
        "node.label.zone": ["us-east-1a"],
        "deployment.label.release": ["v42"],
    })
    ds = ray.data.from_arrow(pa.table({"k8s.pod.ip": ["1.2.3.4"]}))
    out = K8sAttributes(
        snap,
        metadata=["k8s.pod.name"],
        labels=[{"tag_name": "zone", "key": "zone", "from": "node"},
                {"tag_name": "release", "key": "release", "from": "deployment"}],
    ).apply(ds).to_pandas()
    assert list(out["zone"]) == ["us-east-1a"]
    assert list(out["release"]) == ["v42"]


def test_extract_invalid_from_fails_loud():
    import pytest as _pytest

    with _pytest.raises(ValueError, match="not a valid choice for From"):
        K8sAttributes(SNAPSHOT,
                      labels=[{"tag_name": "x", "key": "k", "from": "cluster"}])
