"""MaxMind-DB reader + geoip enrichment tests (public-format test DBs)."""

import ipaddress
import os

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

MMDB_DIR = "/root/reference/tests/data"
pytestmark = pytest.mark.skipif(
    not os.path.exists(os.path.join(MMDB_DIR, "GeoIP2-ISP-Test.mmdb")),
    reason="MaxMind test databases not available",
)


def test_mmdb_lookup_matches_tree_enumeration():
    from vector_ray.mmdb import MmdbReader

    r = MmdbReader(os.path.join(MMDB_DIR, "GeoIP2-ISP-Test.mmdb"))
    nets = list(r.networks_ipv4())
    assert len(nets) > 100
    for start, depth, rec in nets[::37]:
        assert r.lookup_ipv4(start) == rec
        end = start + (1 << (32 - depth)) - 1
        assert r.lookup_ipv4(end) == rec
    # an address outside every network misses
    assert r.lookup_ipv4(int(ipaddress.ip_address("10.0.0.1"))) is None


def test_mmdb_known_city_record():
    from vector_ray.mmdb import MmdbReader

    r = MmdbReader(os.path.join(MMDB_DIR, "GeoIP2-City-Test.mmdb"))
    rec = r.lookup_ipv4(int(ipaddress.ip_address("2.125.160.216")))
    assert rec["country"]["iso_code"] == "GB"
    assert rec["city"]["names"]["en"] == "Boxford"


def test_ip_enrich_from_mmdb(ray_session):
    from vector_ray.enrich_ip import IpRangeTable, ip_enrich
    from vector_ray.mmdb import MmdbReader

    table = IpRangeTable.from_mmdb(os.path.join(MMDB_DIR, "GeoIP2-ISP-Test.mmdb"))
    r = MmdbReader(os.path.join(MMDB_DIR, "GeoIP2-ISP-Test.mmdb"))
    nets = list(r.networks_ipv4())[:50]
    ips = [s for s, _, _ in nets] + [int(ipaddress.ip_address("10.0.0.1"))]
    ds = rd.from_arrow(pa.table({"ip": pa.array(ips, type=pa.int64())}))
    out = ip_enrich(ds, table, "ip", select=["isp"]).to_pandas().sort_values("ip")
    flat = {s: rec.get("isp") for s, _, rec in nets}
    for _, row in out.iterrows():
        if row["ip"] in flat:
            assert row["isp"] == flat[row["ip"]]
        else:
            assert row["isp"] is None or row["isp"] != row["isp"]
