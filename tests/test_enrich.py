"""Enrichment-table semantics (lib/enrichment/src/lib.rs:22-56,
src/enrichment_tables/file.rs index probe + case folding; memory table
TTL upsert/lookup)."""

import pyarrow as pa
import pytest
import ray.data as rd

from vector_ray.enrich import EnrichTable, enrich
from vector_ray.state.memory_table import MemoryTableActor, memory_enrich


def lookup_table():
    return pa.table(
        {
            "source": pa.array(["web", "app", "syslog", "k8s", "edge"]),
            "region": pa.array(["us", "eu", "us", "ap", "eu"]),
            "tier": pa.array([1, 2, 1, 3, 2], type=pa.int32()),
        }
    )


def events():
    return pa.table(
        {
            "id": pa.array([0, 1, 2, 3]),
            "source": pa.array(["web", "APP", "edge", "nope"]),
        }
    )


def test_probe_exact_match():
    t = EnrichTable(lookup_table(), ["source"])
    out = t.probe(events(), on=["source"])
    assert out["region"].to_pylist() == ["us", None, "eu", None]  # case-sensitive: APP misses
    assert out["tier"].to_pylist() == [1, None, 2, None]


def test_probe_case_insensitive():
    t = EnrichTable(lookup_table(), ["source"], case_sensitive=False)
    out = t.probe(events(), on=["source"])
    assert out["region"].to_pylist() == ["us", "eu", "eu", None]


def test_probe_select_subset():
    t = EnrichTable(lookup_table(), ["source"])
    out = t.probe(events(), on=["source"], select=["region"])
    assert "tier" not in out.column_names


def test_single_match_rule():
    # duplicate key without a disambiguating range → error (lib.rs:56)
    dup = pa.table({"source": pa.array(["dup", "dup"]), "v": pa.array([1, 2])})
    t = EnrichTable(dup, ["source"])
    with pytest.raises(ValueError, match="single-match"):
        t.probe(pa.table({"source": pa.array(["dup"])}), on=["source"])


def test_date_range_disambiguates():
    # same key, two validity windows → range picks exactly one (BetweenDates)
    tbl = pa.table(
        {
            "source": pa.array(["web", "web"]),
            "region": pa.array(["old", "new"]),
            "valid_from": pa.array([0, 100], type=pa.int64()).cast(pa.timestamp("us")),
            "valid_to": pa.array([99, 200], type=pa.int64()).cast(pa.timestamp("us")),
        }
    )
    t = EnrichTable(tbl, ["source"], valid_from="valid_from", valid_to="valid_to")
    batch = pa.table(
        {
            "source": pa.array(["web", "web", "web"]),
            "ts": pa.array([50, 150, 500], type=pa.int64()).cast(pa.timestamp("us")),
        }
    )
    out = t.probe(batch, on=["source"], date_field="ts", select=["region"])
    assert out["region"].to_pylist() == ["old", "new", None]


def test_enrich_stage_broadcast():
    t = EnrichTable(lookup_table(), ["source"])
    ds = rd.from_arrow(events())
    out = enrich(ds, t, on=["source"], concurrency=2)
    rows = {r["id"]: r.get("region") for r in out.take_all()}
    assert rows == {0: "us", 1: None, 2: "eu", 3: None}


def test_memory_table_upsert_then_lookup():
    actor = MemoryTableActor("k", ["v"], ttl_secs=10, ts_field="ts")
    b1 = pa.table(
        {
            "k": pa.array(["a", "a", "b"]),
            "v": pa.array([1, 2, 3], type=pa.int64()),
            "ts": pa.array([0, 1_000_000, 2_000_000], type=pa.int64()),
        }
    )
    out = actor(b1)
    # each row sees PREVIOUS state: first a → None, second a → 1, b → None
    assert out["mem_v"].to_pylist() == [None, 1, None]
    # TTL expiry: 20s later, 'a' (written t=1s) has expired
    b2 = pa.table(
        {
            "k": pa.array(["a"]),
            "v": pa.array([9], type=pa.int64()),
            "ts": pa.array([21_000_000], type=pa.int64()),
        }
    )
    assert actor(b2)["mem_v"].to_pylist() == [None]
    # but the upsert from b2 is visible immediately after
    b3 = pa.table(
        {
            "k": pa.array(["a"]),
            "v": pa.array([0], type=pa.int64()),
            "ts": pa.array([22_000_000], type=pa.int64()),
        }
    )
    assert actor(b3)["mem_v"].to_pylist() == [9]


def test_memory_enrich_stage():
    t = pa.table(
        {
            "k": pa.array(["x", "x", "x"]),
            "v": pa.array([5, 6, 7], type=pa.int64()),
            "ts": pa.array([0, 1, 2], type=pa.int64()),
        }
    )
    out = memory_enrich(rd.from_arrow(t), "k", ["v"], ts_field="ts", concurrency=1)
    vals = sorted(r["mem_v"] if r["mem_v"] is not None else -1 for r in out.take_all())
    assert vals == [-1, 5, 6]
