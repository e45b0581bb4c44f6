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


# ---- reference-parity ports: src/enrichment_tables/file.rs tests ----

def test_parse_file_with_and_without_headers(tmp_path):
    """file.rs parse_file_with_headers / parse_file_no_headers: values
    load as strings; headerless columns are named by position."""
    from vector_ray.enrich import EnrichTable

    p = tmp_path / "table.csv"
    p.write_text("foo,bar\na,1\nb,2")
    t = EnrichTable.from_csv(str(p), ["foo"])
    assert t.table.column_names == ["foo", "bar"]
    assert t.table["bar"].to_pylist() == ["1", "2"]  # strings, not ints

    p2 = tmp_path / "nohead.csv"
    p2.write_text("a,1\nb,2")
    t2 = EnrichTable.from_csv(str(p2), ["0"], include_headers=False)
    assert t2.table.column_names == ["0", "1"]
    assert t2.table["0"].to_pylist() == ["a", "b"]


def test_parse_column_schema_types(tmp_path):
    """file.rs parse_column: string/date/date|fmt (space-tolerant)/
    timestamp|%+/int specs."""
    import pandas as pd

    from vector_ray.enrich import parse_schema_column

    arr = pa.array(["zork"])
    assert parse_schema_column(arr, " string ").to_pylist() == ["zork"]
    got = parse_schema_column(pa.array(["2020-03-05"]), " date ").to_pylist()
    assert got == [pd.Timestamp(2020, 3, 5)]
    got = parse_schema_column(pa.array(["03/05/2020"]), "date|%m/%d/%Y").to_pylist()
    assert got == [pd.Timestamp(2020, 3, 5)]
    got = parse_schema_column(pa.array(["03 05 2020"]), "date | %m %d %Y").to_pylist()
    assert got == [pd.Timestamp(2020, 3, 5)]
    got = parse_schema_column(
        pa.array(["2001-07-08T00:34:00.026490+09:30"]), "timestamp | %+"
    ).to_pylist()
    assert got == [pd.Timestamp("2001-07-07 15:04:00.026490")]  # UTC-normalized
    assert parse_schema_column(pa.array(["42"]), "int").to_pylist() == [42]


def test_errors_on_missing_index_columns():
    """file.rs errors_on_missing_columns error message parity."""
    import pytest

    from vector_ray.enrich import EnrichTable

    t = pa.table({"field1": ["a"], "field2": ["b"], "field3": ["c"]})
    with pytest.raises(ValueError, match="field\\(s\\) 'apples, bananas' missing"):
        EnrichTable(t, ["apples", "field2", "bananas"])


def test_finds_row_with_wildcard(ray_session):
    """file.rs finds_row_with_wildcard / .._case_sensitive_and_wildcard:
    probes with no direct match fall back to the wildcard row."""
    import ray.data as rd

    from vector_ray.enrich import EnrichTable, enrich

    lut = EnrichTable(
        pa.table({"field1": ["zip", "zirp"], "field2": ["zup", "zurp"]}),
        ["field1"],
    )
    batch = pa.table({"field1": pa.array(["nonexistent", "zip"])})
    out = lut.probe(batch, ["field1"], wildcard="zirp")
    assert out["field2"].to_pylist() == ["zurp", "zup"]
    # without the wildcard the miss stays null
    out2 = lut.probe(batch, ["field1"])
    assert out2["field2"].to_pylist() == [None, "zup"]
    # through the distributed stage too
    ds = enrich(rd.from_arrow(batch), lut, ["field1"], wildcard="zirp")
    got = ds.to_pandas().sort_values("field1")["field2"].tolist()
    assert got == ["zurp", "zup"]


def test_case_insensitive_lookup(ray_session):
    """file.rs finds_rows_with_index_case_insensitive analog."""
    from vector_ray.enrich import EnrichTable

    lut = EnrichTable(
        pa.table({"k": ["ZiP", "zirp"], "v": ["zup", "zurp"]}),
        ["k"], case_sensitive=False,
    )
    out = lut.probe(pa.table({"k": pa.array(["zip", "ZIRP"])}), ["k"])
    assert out["v"].to_pylist() == ["zup", "zurp"]
    # sensitive: no match for wrong case
    lut2 = EnrichTable(pa.table({"k": ["ZiP"], "v": ["zup"]}), ["k"])
    out2 = lut2.probe(pa.table({"k": pa.array(["zip"])}), ["k"])
    assert out2["v"].to_pylist() == [None]


def test_open_ended_date_bounds(ray_session):
    """file.rs finds_row_from_date / finds_row_to_date: a row with a
    NULL from/to bound is open-ended on that side."""
    import datetime as dt

    import pyarrow as pa

    from vector_ray.enrich import EnrichTable

    t = pa.table({
        "k": ["a", "a"],
        "zip": ["early", "late"],
        "from": pa.array([None, dt.datetime(2020, 1, 1)], type=pa.timestamp("us")),
        "to": pa.array([dt.datetime(2019, 12, 31, 23, 59, 59), None],
                       type=pa.timestamp("us")),
    })
    table = EnrichTable(t, key_columns=["k"], valid_from="from", valid_to="to")
    probe = pa.table({
        "k": ["a", "a"],
        "ts": pa.array([dt.datetime(2015, 6, 1), dt.datetime(2023, 6, 1)],
                       type=pa.timestamp("us")),
    })
    out = table.probe(probe, on=["k"], select=["zip"], date_field="ts")
    assert out["zip"].to_pylist() == ["early", "late"]


def test_probe_key_order_insensitive():
    """file.rs duplicate_indexes (:916): an index on (field2, field3)
    IS the index on (field3, field2) — columnar analog: probe results
    don't depend on the order of the `on` keys."""
    t2 = pa.table(
        {
            "a": pa.array(["x", "x", "y"]),
            "b": pa.array(["1", "2", "1"]),
            "v": pa.array([10, 20, 30]),
        }
    )
    ev = pa.table({"a": pa.array(["x", "y"]), "b": pa.array(["2", "1"])})
    t_ab = EnrichTable(t2, ["a", "b"]).probe(ev, on=["a", "b"])
    t_ba = EnrichTable(t2, ["b", "a"]).probe(ev, on=["b", "a"])
    assert t_ab["v"].to_pylist() == t_ba["v"].to_pylist() == [20, 30]


def test_probe_no_rows_found_is_null():
    """file.rs doesnt_find_row / doesnt_find_row_with_index (:1450):
    a miss enriches with nulls (the batch analog of the reference's
    'no rows found' per-event error), including when a wildcard row
    exists but the wildcard key itself misses."""
    lut = pa.table({"source": pa.array(["zip", "zirp"]),
                    "field2": pa.array(["zup", "zurp"])})
    t = EnrichTable(lut, ["source"])
    out = t.probe(pa.table({"source": pa.array(["zorp"])}), on=["source"])
    assert out["field2"].to_pylist() == [None]
    # with a wildcard row present, a miss falls back to it; without a
    # matching wildcard value the miss stays null
    lut_w = pa.table({"source": pa.array(["zip", "*"]),
                      "field2": pa.array(["zup", "wild"])})
    tw = EnrichTable(lut_w, ["source"])
    out = tw.probe(pa.table({"source": pa.array(["zorp"])}),
                   on=["source"], wildcard="*")
    assert out["field2"].to_pylist() == ["wild"]
