"""GeoIP-shape CIDR range enrichment (stages/geoip.py): IP parsing,
overlap detection, containment edges, and the malformed-IP null path."""

import ipaddress

import pyarrow as pa
import pytest
import ray.data

from opentelemetry_collector_contrib_ray.stages.geoip import (
    cidr_to_ranges,
    geoip_enrich,
    ipv4_to_uint32,
)


def test_ipv4_to_uint32_vectors():
    ips = ["0.0.0.0", "255.255.255.255", "10.1.2.3", "192.168.0.1",
           "999.1.1.1", "not-an-ip", None, "1.2.3"]
    vals, ok = ipv4_to_uint32(pa.array(ips))
    for i, s in enumerate(ips[:4]):
        assert ok[i] and vals[i] == int(ipaddress.ip_address(s))
    assert not ok[4] and not ok[5] and not ok[6] and not ok[7]


def test_cidr_overlap_fails_loud():
    db = pa.table({"cidr": ["10.0.0.0/8", "10.1.0.0/16"], "r": ["a", "b"]})
    with pytest.raises(ValueError, match="overlap"):
        cidr_to_ranges(db)


def test_enrich_edges_and_nulls(ray_session):
    db = pa.table({"cidr": ["10.0.0.0/16", "10.2.0.0/15"],
                   "region": ["alpha", "beta"]})
    ranges = cidr_to_ranges(db)
    rows = pa.table({"ip": [
        "10.0.0.0",        # first address of block 1
        "10.0.255.255",    # last address of block 1
        "10.1.0.0",        # gap between blocks
        "10.2.0.0",        # first of /15
        "10.3.255.255",    # last of /15
        "10.4.0.0",        # past the end
        "bogus",           # malformed
    ]})
    ds = ray.data.from_arrow(rows)
    out = geoip_enrich(ds, "ip", ranges, ["region"], how="left").to_pandas()
    assert list(out["region"]) == ["alpha", "alpha", None, "beta", "beta",
                                   None, None]
    inner = geoip_enrich(ds, "ip", ranges, ["region"], how="inner").to_pandas()
    assert len(inner) == 4
