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


def test_geoip_city_lookup_reference_layout():
    """Port of enrichment_tables/geoip.rs city_lookup: Vector's City
    field set for 2.125.160.216 against the MaxMind test database,
    including most-specific-subdivision region fields."""
    from vector_ray.enrich_ip import IpRangeTable
    from vector_ray.mmdb import to_city_range_table

    t = IpRangeTable(to_city_range_table(
        "/root/reference/tests/data/GeoIP2-City-Test.mmdb"))
    import pyarrow as pa

    out = t.probe(pa.table({"ip": ["2.125.160.216"]}), "ip")
    row = out.to_pylist()[0]
    assert row["city_name"] == "Boxford"
    assert row["country_code"] == "GB"
    assert row["continent_code"] == "EU"
    assert row["country_name"] == "United Kingdom"
    assert row["region_code"] == "WBK"
    assert row["region_name"] == "West Berkshire"
    assert row["timezone"] == "Europe/London"
    assert row["latitude"] == 51.75 and row["longitude"] == -1.25
    assert row["postal_code"] == "OX1"
    assert row["metro_code"] is None


def test_geoip_isp_and_connection_lookups():
    """Ports of geoip.rs isp_lookup / connection_type_lookup_success:
    flat records pass through with Vector's field names."""
    import pyarrow as pa

    from vector_ray.enrich_ip import IpRangeTable

    isp = IpRangeTable.from_mmdb("/root/reference/tests/data/GeoIP2-ISP-Test.mmdb")
    row = isp.probe(pa.table({"ip": ["208.192.1.2"]}), "ip").to_pylist()[0]
    assert row["autonomous_system_number"] == 701
    assert row["autonomous_system_organization"] == (
        "MCI Communications Services, Inc. d/b/a Verizon Business")
    assert row["isp"] == "Verizon Business"
    assert row["organization"] == "Verizon Business"

    ct = IpRangeTable.from_mmdb(
        "/root/reference/tests/data/GeoIP2-Connection-Type-Test.mmdb")
    row = ct.probe(pa.table({"ip": ["201.243.200.1"]}), "ip").to_pylist()[0]
    assert row["connection_type"] == "Corporate"
