"""Driver contract for the vector_ray engine.

``entry()`` runs the flagship parse→enrich→route→aggregate pipeline on
sf0.001.  ``queries()`` exposes one callable per implemented operator
(SURVEY.md §2) over the driver's parquet tables; ``oracle_sql()`` gives
the DuckDB-equivalent SQL for every SQL-expressible query (same column
names, rounded floats).  Non-SQL-expressible pipelines (minhash/simhash
dedup, IVF ANN, lang-id/quality heuristics, the synthetic token
pipeline) are rows-only checks.

No ray.init()/ray.shutdown() here — the driver owns the session.
"""

from __future__ import annotations

import os
from collections.abc import Callable
from typing import Any

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def _events(sf_dir, columns=None):
    import ray.data as rd

    return rd.read_parquet(os.path.join(sf_dir, "events.parquet"), columns=columns)


def _docs(sf_dir, columns=None):
    import ray.data as rd

    return rd.read_parquet(os.path.join(sf_dir, "documents.parquet"), columns=columns)


def _round_cols(df, cols, nd=3):
    for c in cols:
        df[c] = df[c].round(nd)
    return df


# --------------------------------------------------------------- entry

def entry() -> Any:
    from vector_ray.pipelines import flagship

    counts, agg = flagship.run(n_rows=10_000)
    return agg  # per-(route, region, status) aggregate table


# ------------------------------------------------------------- queries

def q_filter_events(sf_dir):
    from vector_ray.stages import filter_stage

    ds = _events(sf_dir, ["event_id", "event_type", "user_id", "value"])
    out = filter_stage(ds, ".event_type == 'click' && .value > 50")
    return out.select_columns(["event_id", "user_id", "value"])


def q_route_rows(sf_dir):
    """Routed-row SETS (the north-rule equality): every (event_id, route)
    pair produced by multi-match copy routing."""
    from vector_ray.stages import route_tagged

    ds = _events(sf_dir, ["event_id", "event_type", "value"])
    tagged = route_tagged(
        ds, {"purchase": ".event_type == 'purchase'", "big": ".value > 150"}
    )
    return tagged.select_columns(["event_id", "route"])


def q_exclusive_route_rows(sf_dir):
    from vector_ray.stages import exclusive_route_tagged

    ds = _events(sf_dir, ["event_id", "event_type", "value"])
    tagged = exclusive_route_tagged(
        ds, {"purchase": ".event_type == 'purchase'", "big": ".value > 150"}
    )
    return tagged.select_columns(["event_id", "route"])


def q_incremental_to_absolute(sf_dir):
    """Running-sum normalization per metric series (event-type series)."""
    from vector_ray.stages import incremental_to_absolute, log_to_metric

    ds = _events(sf_dir, ["event_type", "value", "ts"])
    metrics = log_to_metric(
        ds,
        [{"type": "counter", "field": "value", "name": "v",
          "increment_by_value": True, "tags": {"type": "{{event_type}}"}}],
        ts_field="ts",
    )
    out = incremental_to_absolute(metrics)
    df = out.to_pandas()[["tags", "ts", "value"]]
    return _round_cols(df, ["value"], 3)


def q_aggregate_latest(sf_dir):
    """Latest-per-window aggregation (absolute metric semantics)."""
    from vector_ray.stages import aggregate, log_to_metric

    ds = _events(sf_dir, ["event_type", "value", "ts"])
    metrics = log_to_metric(
        ds,
        [{"type": "gauge", "field": "value", "name": "g",
          "tags": {"type": "{{event_type}}"}}],
        ts_field="ts",
    )
    agg = aggregate(metrics, mode="latest", interval_ms=86_400_000)
    df = agg.to_pandas()[["tags", "window_start", "value", "count"]]
    return _round_cols(df, ["value"], 3)


def q_metric_to_log_typed(sf_dir):
    """Typed-payload metric_to_log: gauge lands under gauge.value, tags
    unpack to tags.<k> columns, the configured host tag promotes to a
    top-level host field (metric_to_log.rs:419-460 field layout)."""
    from vector_ray.stages import log_to_metric
    from vector_ray.stages.log_to_metric import metric_to_log_typed

    ds = _events(sf_dir, ["event_type", "value", "ts"])
    metrics = log_to_metric(
        ds,
        [{"type": "gauge", "field": "value", "name": "g",
          "tags": {"host": "node-1", "type": "{{event_type}}"}}],
        ts_field="ts",
    )
    out = metric_to_log_typed(metrics, host_tag="host")
    return out.select_columns(
        ["name", "kind", "gauge.value", "timestamp", "host", "tags.type"]
    )


def q_incremental_reset(sf_dir):
    """incremental_to_absolute with interleaved kinds: purchases arrive
    as ABSOLUTE metrics and reset the per-user running sum
    (MetricSet::make_absolute semantics); all other events accumulate
    incrementally."""
    from vector_ray.stages import incremental_to_absolute

    ds = _events(sf_dir, ["user_id", "event_type", "value", "ts"])

    def _mk(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        kind = pc.if_else(
            pc.equal(batch["event_type"], "purchase"),
            pa.scalar("absolute"), pa.scalar("incremental"),
        )
        tags = pc.binary_join_element_wise(
            pa.array(["u="] * n), batch["user_id"].cast(pa.string()), ""
        )
        return pa.table({
            "name": pa.array(["v"] * n),
            "namespace": pa.array([""] * n),
            "tags": tags,
            "kind": kind,
            "value": batch["value"],
            "ts": batch["ts"],
        })

    metrics = ds.map_batches(_mk, batch_format="pyarrow", batch_size=None)
    out = incremental_to_absolute(metrics)
    df = out.to_pandas()[["tags", "ts", "value"]]
    return _round_cols(df, ["value"], 3)


def q_static_enrich(sf_dir):
    """aws_ec2_metadata analog: broadcast constant metadata columns
    (one driver-side fetch, constant per batch)."""
    from vector_ray.stages.static_enrich import static_enrich

    ds = _events(sf_dir, ["event_id", "user_id"])
    out = static_enrich(ds, {"az": "us-east-1a", "instance_type": "m5.large"})
    return out


def q_trace_to_log(sf_dir):
    """trace_to_log projection: span fields rename to log-schema names
    and every row stamps source_type='trace'."""
    from vector_ray.stages.static_enrich import trace_to_log

    ds = _events(sf_dir, ["event_id", "event_type", "ts"])
    out = trace_to_log(ds, rename={"event_type": "message", "ts": "timestamp"})
    return out


def q_aggregate_sequenced(sf_dir):
    """Kind-conflict auto aggregation (aggregate.rs conflicting_kinds):
    per (user series, day window) ordered by ts, a kind flip replaces
    the accumulated state; the flush is the LAST same-kind segment —
    summed when incremental, last value when absolute."""
    from vector_ray.stages.aggregate import aggregate_sequenced

    ds = _events(sf_dir, ["user_id", "event_type", "value", "ts"])

    def _mk(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        kind = pc.if_else(
            pc.equal(batch["event_type"], "purchase"),
            pa.scalar("absolute"), pa.scalar("incremental"),
        )
        tags = pc.binary_join_element_wise(
            pa.array(["u="] * n), batch["user_id"].cast(pa.string()), ""
        )
        return pa.table({
            "name": pa.array(["v"] * n),
            "namespace": pa.array([""] * n),
            "tags": tags,
            "kind": kind,
            "value": batch["value"],
            "ts": batch["ts"],
        })

    metrics = ds.map_batches(_mk, batch_format="pyarrow", batch_size=None)
    out = aggregate_sequenced(metrics, interval_ms=86_400_000)
    df = out.to_pandas()[["tags", "kind", "window_start", "value"]]
    return _round_cols(df, ["value"], 3)


def q_remap_parse_json(sf_dir):
    """remap: parse the props JSON column, project k."""
    from vector_ray.stages import remap

    ds = _events(sf_dir, ["event_id", "props"])
    out = remap(
        ds,
        [("parse_json", "props", ["k"], {"k": pa.int64()})],
        drop_on_error=True,
    )
    return out.select_columns(["event_id", "k"])


def q_remap_dropped(sf_dir):
    """remap reroute_dropped: rows aborted by a guard condition land on
    the dropped port rolled back (k reverted to null) and annotated with
    metadata.dropped.* (remap.rs:564-646 + check_remap_branching)."""
    from vector_ray.stages import remap_with_drops

    ds = _events(sf_dir, ["event_id", "props"])
    _ok, dropped = remap_with_drops(
        ds,
        [
            ("parse_json", "props", ["k"], {"k": pa.int64()}),
            ("abort", ".k > 90", "k out of range"),
        ],
        component_id="guard",
    )
    return dropped


def q_vrl_program(sf_dir):
    """remap driven by a VRL *source program* (vector_ray/vrl.py — the
    reference's native remap config shape, remap.rs:52): error-capture
    parse, ?? coalescing, if/else-if/else, string concat, del."""
    from vector_ray.stages import remap_vrl

    ds = _events(sf_dir, ["event_id", "event_type", "value", "props"])
    src = """
parsed, e = parse_json(.props)
.k = to_int(parsed.k) ?? -1
if .event_type == "error" { .sev = 3 }
else if .event_type == "signup" { .sev = 6 }
else { .sev = 1 }
.tag = .event_type + ":" + to_string(.sev)
.vk = round(.value * 2 + .k, 3)
.m = (.k - 50) % 7
.up = map_values(filter(split(.event_type, "u")) -> |_i, v| { v != "" }) -> |v| { upcase!(v) }
del(.props)
"""
    out = remap_vrl(ds, src)
    return out.select_columns(["event_id", "k", "sev", "tag", "vk", "m", "up"])


def q_dedupe_events(sf_dir):
    from vector_ray.stages import dedupe_exact

    ds = _events(sf_dir, ["event_id", "user_id", "event_type"])
    out = dedupe_exact(ds, ["user_id", "event_type"], order_by="event_id")
    return out.select_columns(["user_id", "event_type", "event_id"])


def q_sample_mod(sf_dir):
    """Consistent-hash 1-in-10 keyed sampling through the engine's
    sample stage, using its multiplicative-hash mode whose keep-rule is
    SQL-reproducible — the oracle states the identical hash, so this row
    verifies the sampler itself (stages/sample.py:34)."""
    from vector_ray.stages import sample_hash

    ds = _events(sf_dir, ["event_id", "user_id"])
    out = sample_hash(ds, "user_id", rate=10, hash_fn="multiplicative")
    return out.select_columns(["event_id", "user_id", "sample_rate"])


def q_throttle_daily(sf_dir):
    from vector_ray.stages import throttle

    ds = _events(sf_dir, ["event_id", "user_id", "ts"])
    out = throttle(
        ds, threshold=3, window_secs=86_400, ts_field="ts", key_field="user_id",
        order_by="ts",
    )
    return out.select_columns(["event_id"])


def q_log_to_metric_counts(sf_dir):
    from vector_ray.stages import aggregate, log_to_metric

    ds = _events(sf_dir, ["event_type", "value", "ts"])
    metrics = log_to_metric(
        ds,
        [{"type": "counter", "field": "value", "name": "events_total",
          "tags": {"type": "{{event_type}}"}}],
        ts_field="ts",
    )
    agg = aggregate(metrics, mode="sum", interval_ms=10**15)  # one window
    df = agg.to_pandas()[["tags", "value", "count"]]
    return _round_cols(df, ["value"], 3)


def q_aggregate_hourly(sf_dir):
    from vector_ray.stages import aggregate, log_to_metric

    ds = _events(sf_dir, ["event_type", "value", "ts"])
    metrics = log_to_metric(
        ds,
        [{"type": "counter", "field": "value", "name": "value_sum",
          "increment_by_value": True, "tags": {"type": "{{event_type}}"}}],
        ts_field="ts",
    )
    agg = aggregate(metrics, mode="sum", interval_ms=3_600_000)
    df = agg.to_pandas()[["tags", "window_start", "value", "count"]]
    return _round_cols(df, ["value"], 3)


def q_histogram_buckets(sf_dir):
    """Histogram metric payloads: log_to_metric histogram spec →
    distribution merge per (series, day) → aggregated-histogram bucket
    counts (long form; bucket_upper=+inf for overflow)."""
    from vector_ray.stages import log_to_metric
    from vector_ray.stages.metric_payload import aggregated_histogram, distribution_agg

    ds = _events(sf_dir, ["event_type", "value", "ts"])
    metrics = log_to_metric(
        ds,
        [{"type": "histogram", "field": "value", "name": "v_hist",
          "tags": {"type": "{{event_type}}"}}],
        ts_field="ts",
    )
    long = distribution_agg(metrics, interval_ms=86_400_000)
    df = aggregated_histogram(long, limits=[25.0, 50.0, 100.0, 200.0]).to_pandas()
    df = df[["tags", "window_start", "bucket_upper", "bucket_count", "count", "sum"]]
    return _round_cols(df, ["sum"], 3)


def q_summary_quantiles(sf_dir):
    """Summary metric payloads: per-(series, day) q50/q90 with linear
    interpolation (matches SQL quantile_cont)."""
    from vector_ray.stages import log_to_metric
    from vector_ray.stages.metric_payload import aggregated_summary, distribution_agg

    ds = _events(sf_dir, ["event_type", "value", "ts"])
    metrics = log_to_metric(
        ds,
        [{"type": "summary", "field": "value", "name": "v_sum",
          "tags": {"type": "{{event_type}}"}}],
        ts_field="ts",
    )
    long = distribution_agg(metrics, interval_ms=86_400_000)
    df = aggregated_summary(long, quantiles=(0.5, 0.9)).to_pandas()
    df = df[["tags", "window_start", "quantile", "qvalue", "count", "sum"]]
    return _round_cols(df, ["qvalue", "sum"], 3)


def q_rolling_value(sf_dir):
    """Per-user rolling 5-event sum/mean of value (count-based sliding
    window, SQL ROWS-frame oracle)."""
    from vector_ray.stages.rolling import rolling_agg

    ds = _events(sf_dir, ["event_id", "user_id", "value", "ts"])
    out = rolling_agg(
        ds, ["user_id"], [("value", "sum", "roll_sum"), ("value", "mean", "roll_mean")],
        window_n=5, order_by="ts",
    )
    df = out.to_pandas()[["event_id", "roll_sum", "roll_mean"]]
    # means land on exact decimal midpoints where the two engines' sums
    # differ in the last ulp — double-round (6 then 3, half-away) on
    # BOTH sides so the midpoint decision is made on identical values
    for c in ("roll_sum", "roll_mean"):
        x = np.floor(df[c] * 1_000_000 + 0.5) / 1_000_000
        df[c] = np.floor(x * 1000 + 0.5) / 1000
    return df


def q_ddsketch_buckets(sf_dir):
    """DDSketch metric payloads (MetricValue::Sketch analog): log-γ
    bucket state per (series, day) — deterministic and mergeable, so
    the oracle recomputes the exact bucket counts."""
    from vector_ray.stages import log_to_metric
    from vector_ray.stages.sketch import ddsketch_agg

    ds = _events(sf_dir, ["event_type", "value", "ts"])
    metrics = log_to_metric(
        ds,
        [{"type": "distribution", "field": "value", "name": "v_sketch",
          "tags": {"type": "{{event_type}}"}}],
        ts_field="ts",
    )
    sk = ddsketch_agg(metrics, interval_ms=86_400_000, alpha=0.01)
    df = sk.to_pandas()[["tags", "window_start", "bucket", "count"]]
    return df


def q_topk_windows(sf_dir):
    """Top-3 events by value per event type (local top-k combiner +
    candidate-only shuffle)."""
    from vector_ray.stages.topk import topk_per_group

    ds = _events(sf_dir, ["event_id", "event_type", "value"])
    out = topk_per_group(ds, ["event_type"], "value", k=3, tie_col="event_id")
    df = out.to_pandas()[["event_type", "event_id", "value"]]
    return _round_cols(df, ["value"], 3)


def q_reduce_sessions(sf_dir):
    from vector_ray.stages import reduce_stage

    ds = _events(sf_dir, ["event_id", "user_id", "event_type", "value", "ts"])
    out = reduce_stage(
        ds,
        ["user_id"],
        merge_strategies={"event_type": "discard", "value": "sum", "event_id": "min"},
        order_by="ts",
    )
    df = out.to_pandas()
    df = df.rename(columns={"_reduce_count": "n_events", "ts": "ts_start"})
    df = df[["user_id", "n_events", "event_type", "value", "event_id", "ts_start", "ts_end"]]
    return _round_cols(df, ["value"], 3)


def q_reduce_sessionized(sf_dir):
    """Sessionization: a 'signup' event CLOSES the current session
    (ends_when, reduce/transform.rs:223-254); one output row per
    (user, session)."""
    from vector_ray.stages import reduce_stage

    ds = _events(sf_dir, ["event_id", "user_id", "event_type", "ts"])
    out = reduce_stage(
        ds,
        ["user_id"],
        merge_strategies={"event_id": "min", "event_type": "discard"},
        order_by="ts",
        ends_when=".event_type == 'signup'",
    )
    df = out.to_pandas().rename(
        columns={"_reduce_count": "n_events", "ts": "ts_start"}
    )
    return df[["user_id", "n_events", "ts_start", "ts_end"]]


def q_reduce_gap_sessions(sf_dir):
    """Gap-based sessionization (expire_after_ms staleness flush): a
    session closes when a user is idle > 6h; one row per session."""
    from vector_ray.stages import reduce_stage

    ds = _events(sf_dir, ["event_id", "user_id", "ts"])
    out = reduce_stage(
        ds,
        ["user_id"],
        merge_strategies={"event_id": "min"},
        order_by="ts",
        expire_after_ms=6 * 3_600_000,
    )
    df = out.to_pandas().rename(columns={"_reduce_count": "n_events", "ts": "ts_start"})
    return df[["user_id", "n_events", "event_id", "ts_start", "ts_end"]]


def q_sample_hash(sf_dir):
    """Consistent-hash 1-in-4 sampling on user_id (rows-only: the hash
    is ours, not SQL's — determinism checked by the repeat run)."""
    from vector_ray.stages import sample_hash

    ds = _events(sf_dir, ["event_id", "user_id"])

    keyed = ds.map_batches(
        lambda b: b.append_column("uk", b["user_id"].cast(pa.string())),
        batch_format="pyarrow",
    )
    out = sample_hash(keyed, "uk", rate=4)
    return out.select_columns(["event_id", "sample_rate"])


def q_dedupe_windowed(sf_dir):
    """LRU-windowed dedupe (cache 50) over the ordered event stream,
    single actor — Vector's streaming dedupe semantics (rows-only)."""
    from vector_ray.stages import dedupe_windowed

    ds = (
        _events(sf_dir, ["event_id", "user_id", "event_type"])
        .repartition(1)
        .sort("event_id")
    )
    out = dedupe_windowed(ds, ["user_id", "event_type"], cache_size=50, concurrency=1)
    return out.select_columns(["event_id"])


def q_dedupe_windowed_exact(sf_dir):
    """LRU-windowed dedupe with a cache larger than the key space: no
    evictions, so the streaming LRU must agree exactly with first-per-
    key SQL — verifies the LRU stage's no-eviction boundary (the
    eviction path stays covered by the rows-only `dedupe_windowed`)."""
    from vector_ray.stages import dedupe_windowed

    ds = (
        _events(sf_dir, ["event_id", "user_id", "event_type"])
        .repartition(1)
        .sort("event_id")
    )
    out = dedupe_windowed(ds, ["user_id", "event_type"], cache_size=1_000_000,
                          concurrency=1)
    return out.select_columns(["event_id"])


def q_hopping_agg(sf_dir):
    """Hopping-window aggregate (size 2h, slide 1h) — beyond the
    reference's tumbling aggregate; each row lands in 2 windows."""
    from vector_ray.stages.windowed_agg import hopping_agg

    ds = _events(sf_dir, ["event_type", "value", "ts"])
    df = hopping_agg(
        ds, ["event_type"], [("value", "sum", "total"), ("value", "count", "n")],
        ts_field="ts", size_ms=7_200_000, slide_ms=3_600_000,
    )
    return _round_cols(df, ["total"], 3)


def q_window_context(sf_dir):
    from vector_ray.stages import window_stage

    ds = _events(sf_dir, ["event_id", "user_id", "event_type", "ts"])
    out = window_stage(
        ds,
        flush_when=".event_type == 'error'",
        group_by=["user_id"],
        order_by="ts",
        num_events_before=2,
        num_events_after=1,
    )
    return out.select_columns(["event_id"])


def q_tag_cardinality(sf_dir):
    from vector_ray.stages import tag_cardinality_limit

    ds = _events(sf_dir, ["event_id", "user_id"])
    out = tag_cardinality_limit(
        ds, ["user_id"], value_limit=20, order_by="event_id",
        limit_exceeded_action="drop_event",
    )
    return out.select_columns(["event_id"])


def q_enrich_nation(sf_dir):
    import ray.data as rd

    from vector_ray.enrich import EnrichTable, enrich

    nation = rd.read_parquet(os.path.join(sf_dir, "nation.parquet")).to_pandas()
    lut = pa.table(
        {"nk": pa.array(nation["n_nationkey"].astype("int64")).cast(pa.string()),
         "n_name": pa.array(nation["n_name"])}
    )
    table = EnrichTable(lut, ["nk"])
    ds = _events(sf_dir, ["event_id", "user_id"])

    def _key(b: pa.Table) -> pa.Table:
        return b.append_column(
            "nk", pa.array((b["user_id"].to_numpy() % 25).astype(str))
        )

    keyed = ds.map_batches(_key, batch_format="pyarrow")
    out = enrich(keyed, table, on=["nk"])
    return out.select_columns(["event_id", "n_name"])


def q_join_orders_customers(sf_dir):
    """Large-large hash join (orders ⋈ customer) → per-segment rollup."""
    import ray.data as rd

    from vector_ray.stages.join import hash_join
    from vector_ray.stages.partial_agg import grouped_aggregate

    orders = rd.read_parquet(
        os.path.join(sf_dir, "orders.parquet"),
        columns=["o_orderkey", "o_custkey", "o_totalprice"],
    )
    cust = rd.read_parquet(
        os.path.join(sf_dir, "customer.parquet"),
        columns=["c_custkey", "c_mktsegment"],
    )
    joined = hash_join(orders, cust, on=["o_custkey"], right_on=["c_custkey"])
    df = grouped_aggregate(
        joined,
        ["c_mktsegment"],
        [("o_orderkey", "count", "n_orders"), ("o_totalprice", "sum", "total")],
    )
    return _round_cols(df, ["total"], 2)


def q_pricing_summary(sf_dir):
    """TPC-H-Q1-shaped groupby via the engine's partial-aggregate
    machinery: per-batch Arrow group_by combiners, then a 6-row
    combine — no sort-based shuffle for a 6-group aggregate (the
    flagship's sink-edge pattern)."""
    import ray.data as rd

    from vector_ray.stages.partial_agg import grouped_aggregate

    ds = rd.read_parquet(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice",
                 "l_discount"],
    )

    def _rev(b: pa.Table) -> pa.Table:
        rev = pc.multiply(b["l_extendedprice"], pc.subtract(pa.scalar(1.0), b["l_discount"]))
        return b.append_column("revenue", rev)

    ds = ds.map_batches(_rev, batch_format="pyarrow")
    out = grouped_aggregate(
        ds,
        ["l_returnflag", "l_linestatus"],
        [
            ("l_quantity", "sum", "sum_qty"),
            ("revenue", "sum", "sum_rev"),
            ("l_discount", "sum", "sum_disc"),
            ("l_quantity", "count", "n"),
        ],
    )
    return _round_cols(out, ["sum_qty", "sum_rev"], 2).pipe(_round_cols, ["sum_disc"], 3)


def q_salted_pricing(sf_dir):
    """Skew-safe two-level aggregation (salted groupby) over lineitem."""
    import ray.data as rd

    from vector_ray.stages.salted import salted_groupby_agg

    ds = rd.read_parquet(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_returnflag", "l_orderkey", "l_quantity"],
    )
    df = salted_groupby_agg(
        ds,
        ["l_returnflag"],
        [("l_quantity", "count", "n"), ("l_quantity", "sum", "sum_qty"),
         ("l_quantity", "max", "max_qty")],
        salt=8,
        salt_on="l_orderkey",
    )
    return _round_cols(df, ["sum_qty"], 2)


def q_doc_token_count(sf_dir):
    from vector_ray.functions.text import token_counts

    ds = _docs(sf_dir, ["doc_id", "text"])
    out = ds.map_batches(lambda b: token_counts(b), batch_format="pyarrow")
    return out.select_columns(["doc_id", "n_ws_tokens"])


def q_dedup_docs_exact(sf_dir):
    from vector_ray.pipelines.dedup import exact_dedup

    out = exact_dedup(_docs(sf_dir, ["doc_id", "text"]))
    return out.select_columns(["doc_id"])


def q_quality_scores(sf_dir):
    """Vectorized doc-quality heuristics, fully recomputable in SQL
    (word split, stopword ratio, distinct-word ratio, punctuation)."""
    from vector_ray.functions.text import QualityScorer

    from vector_ray.functions.hashes import default_pool

    ds = _docs(sf_dir, ["doc_id", "text"]).map_batches(
        QualityScorer, batch_format="pyarrow", concurrency=default_pool(divisor=16)
    )
    df = ds.select_columns(
        ["doc_id", "n_words", "stop_ratio", "uniq_ratio", "quality_score"]
    ).to_pandas()
    # ratios are small-denominator fractions (k/32 …) that land on exact
    # decimal midpoints — round half-AWAY like SQL, not banker's
    for c in ("stop_ratio", "uniq_ratio", "quality_score"):
        df[c] = np.floor(df[c] * 10_000 + 0.5) / 10_000
    return df


def _query_vectors(path, n=3):
    """The n query vectors (vec_id < n) — a tiny driver-side side input
    fetched with a filtered parquet read, not a Ray job (a full
    read→filter→to_pandas pipeline costs ~2.5 s of plan/launch overhead
    to fetch 3 rows)."""
    import pyarrow.parquet as pq

    t = pq.read_table(
        path, columns=["vec_id", "embedding"], filters=[("vec_id", "<", n)]
    ).to_pandas().sort_values("vec_id")
    return np.stack(t["embedding"].to_numpy()).astype(np.float64)


def q_ivf_topk_full(sf_dir):
    """IVF ANN probing EVERY list (nprobe = n_lists): exercises the
    full quantize→bucket→probe→merge machinery with exact recall, so
    the brute-force SQL oracle applies."""
    import ray.data as rd

    from vector_ray.pipelines.ann import ivf_topk

    path = os.path.join(sf_dir, "embeddings.parquet")
    emb = rd.read_parquet(path)
    queries = _query_vectors(path)
    out = ivf_topk(emb, queries, k=10, n_lists=8, nprobe=8).to_pandas()
    return out[["query_id", "vec_id", "rank"]]


def q_ivf_index_topk(sf_dir):
    """Materialized IVF index (build once into a list-partitioned
    parquet layout, then search reading only probed partitions).  Full
    probe ⇒ exact, so the brute-force SQL oracle applies."""
    import ray.data as rd

    from vector_ray.pipelines.ann import build_ivf_index, ivf_search

    path = os.path.join(sf_dir, "embeddings.parquet")
    idx_dir = os.path.join(
        "/tmp/vector_ray_ivf",
        f"{os.path.basename(os.path.normpath(sf_dir))}-{os.path.getsize(path)}",
    )
    if not os.path.exists(os.path.join(idx_dir, "centroids.parquet")):
        build_ivf_index(rd.read_parquet(path), idx_dir, n_lists=8)
    queries = _query_vectors(path)
    out = ivf_search(idx_dir, queries, k=10, nprobe=8).to_pandas()
    return out[["query_id", "vec_id", "rank"]]


def q_ann_topk(sf_dir):
    """Brute-force cosine top-10 for the first 3 vectors as queries."""
    import ray.data as rd

    from vector_ray.pipelines.ann import brute_force_topk

    path = os.path.join(sf_dir, "embeddings.parquet")
    emb = rd.read_parquet(path)
    queries = _query_vectors(path)
    out = brute_force_topk(emb, queries, k=10).to_pandas()
    out = out[["query_id", "vec_id", "rank"]]
    return out


# ------------------------- rows-only (non-SQL-expressible) pipelines

def q_token_pipeline(sf_dir):
    """Flagship pipeline over the synthetic token table sized to sf."""
    from vector_ray import schema
    from vector_ray.pipelines import flagship

    counts, agg = flagship.run(n_rows=schema.sf_to_rows(sf_dir))
    return agg


def q_minhash_dedup(sf_dir):
    """MinHash+LSH near-dup removal over a planted-cluster corpus
    derived from `documents`: base docs are pairwise-dissimilar by
    construction; normalization-equal and mutated variants are planted
    with offset ids.  Survivors must be exactly the base ids, which the
    DuckDB oracle states as SELECT doc_id FROM documents."""
    from vector_ray.pipelines.dedup import minhash_lsh_dedup
    from vector_ray.pipelines.dedup_fixture import planted_minhash_corpus

    corpus = planted_minhash_corpus(_docs(sf_dir, ["doc_id", "text"]))
    out = minhash_lsh_dedup(corpus, jaccard_threshold=0.7)
    return out.select_columns(["doc_id"])


def q_ngram_jaccard_dedup(sf_dir):
    """Exact word-n-gram Jaccard dedup (length-bucket blocking) over the
    planted corpus: ws/case variants have Jaccard 1.0, mutated variants
    ~0.78 ≥ the 0.7 threshold, salted bases are pairwise-dissimilar —
    survivors are exactly the base ids."""
    from vector_ray.pipelines.dedup import ngram_jaccard_dedup
    from vector_ray.pipelines.dedup_fixture import planted_minhash_corpus

    corpus = planted_minhash_corpus(_docs(sf_dir, ["doc_id", "text"]))
    out = ngram_jaccard_dedup(corpus, n=3, threshold=0.7)
    return out.select_columns(["doc_id"])


def q_simhash_dedup(sf_dir):
    """SimHash near-dup removal over the planted corpus (whitespace/case
    and word-reversal variants are simhash-identical); survivors = base."""
    from vector_ray.pipelines.dedup import simhash_dedup
    from vector_ray.pipelines.dedup_fixture import planted_simhash_corpus

    corpus = planted_simhash_corpus(_docs(sf_dir, ["doc_id", "text"]))
    out = simhash_dedup(corpus, hamming_k=0)
    return out.select_columns(["doc_id"])


def q_embedding_dedup(sf_dir):
    """Cosine near-dup removal over embeddings with planted positively
    scaled copies (cosine exactly 1); survivors = base vec_ids."""
    import ray.data as rd

    from vector_ray.pipelines.dedup import embedding_dedup
    from vector_ray.pipelines.dedup_fixture import planted_embedding_corpus

    emb = planted_embedding_corpus(
        rd.read_parquet(os.path.join(sf_dir, "embeddings.parquet"),
                        columns=["vec_id", "embedding"])
    )
    return embedding_dedup(emb, threshold=0.999)


def q_text_analysis(sf_dir):
    from vector_ray.functions.text import LangId, QualityScorer, token_counts

    ds = _docs(sf_dir, ["doc_id", "text"]).map_batches(token_counts, batch_format="pyarrow")
    from vector_ray.functions.hashes import default_pool

    pool = default_pool(divisor=16)
    ds = ds.map_batches(QualityScorer, batch_format="pyarrow", concurrency=pool)
    ds = ds.map_batches(LangId, batch_format="pyarrow", concurrency=pool)
    df = ds.select_columns(["doc_id", "n_ws_tokens", "stop_ratio", "lang_pred"]).to_pandas()
    df["stop_ratio"] = np.floor(df["stop_ratio"] * 10_000 + 0.5) / 10_000
    return df


def q_multimodal_features(sf_dir):
    import ray.data as rd

    from vector_ray.pipelines.multimodal import image_features, synth_media_batch

    media = rd.from_arrow(synth_media_batch(0, 300))
    return image_features(media, batch_size=64)


def q_memory_enrich(sf_dir):
    """Writable TTL memory-table: each event sees the previous value
    written for its user (stateful actor stage, single partition)."""
    from vector_ray.state.memory_table import memory_enrich

    ds = _events(sf_dir, ["event_id", "user_id", "value", "ts"]).repartition(1).sort("event_id")
    out = memory_enrich(ds, "user_id", ["value"], ts_field="ts", concurrency=1)
    return out.select_columns(["event_id", "mem_value"])


def q_sample_ratio(sf_dir):
    """Count-mode RATIO sampling (reference accumulator semantics,
    transform.rs:64-73) per user stream — the closed-form keep rule is
    SQL-reproducible (stages/sample.py sample_count)."""
    from vector_ray.stages import sample_count

    ds = _events(sf_dir, ["event_id", "user_id"])
    out = sample_count(ds, ratio=0.3, group_by="user_id", order_by="event_id")
    return out.select_columns(["event_id"])


def q_dd_search_filter(sf_dir):
    """filter with a DatadogSearch condition (src/conditions/
    datadog_search.rs dialect; vector_ray/datadog_search.py)."""
    from vector_ray.stages import filter_stage

    ds = _events(sf_dir, ["event_id", "event_type", "value"])
    out = filter_stage(ds, {
        "type": "datadog_search",
        "source": "(@event_type:purchase AND @value:>100) OR @event_type:error",
    })
    return out.select_columns(["event_id"])


def q_reduce_concat(sf_dir):
    """reduce with the concat merge strategy (merge_strategy.rs:17-55)
    — event_type streams collapse to space-joined transcripts."""
    from vector_ray.stages import reduce_stage

    ds = _events(sf_dir, ["user_id", "event_type", "event_id"])
    out = reduce_stage(
        ds, ["user_id"], merge_strategies={"event_type": "concat"},
        order_by="event_id",
    )
    return out.select_columns(["user_id", "event_type", "_reduce_count"])


def q_enrich_wildcard(sf_dir):
    """Enrichment wildcard fallback (enrichment_tables/file.rs
    row_equals wildcard): unmatched keys take the wildcard row."""
    import ray.data as rd

    from vector_ray.enrich import EnrichTable, enrich

    lut = EnrichTable(
        pa.table({"k": ["purchase", "signup", "other"],
                  "label": ["buy", "join", "misc"]}),
        ["k"],
    )
    ds = _events(sf_dir, ["event_id", "event_type"])
    out = enrich(ds, lut, ["event_type"], select=["label"], wildcard="other")
    return out.select_columns(["event_id", "label"])


def queries() -> dict[str, Callable[[str], Any]]:
    # Ordering contract: the driver verifies the FIRST 50 entries, so
    # every oracle-checked query precedes the rows-only tail (VERDICT r3
    # item 2).  Redundant projections of stronger siblings were retired:
    # route_counts/exclusive_route_counts (derivable from *_rows),
    # metric_to_log (subsumed by metric_to_log_typed),
    # doc_fingerprint_groups (fingerprint path inside dedup_docs_exact),
    # ivf_topk partial-probe (sibling ivf_topk_full is oracle-checked),
    # doc_token_count (projection of text_analysis's n_ws_tokens).
    return {
        # --- oracle-checked (rows+schema+hash vs DuckDB) ---
        "token_pipeline": q_token_pipeline,
        "filter_events": q_filter_events,
        "route_rows": q_route_rows,
        "exclusive_route_rows": q_exclusive_route_rows,
        "remap_parse_json": q_remap_parse_json,
        "remap_dropped": q_remap_dropped,
        "vrl_program": q_vrl_program,
        "incremental_to_absolute": q_incremental_to_absolute,
        "incremental_reset": q_incremental_reset,
        "metric_to_log_typed": q_metric_to_log_typed,
        "aggregate_latest": q_aggregate_latest,
        "aggregate_sequenced": q_aggregate_sequenced,
        "aggregate_hourly": q_aggregate_hourly,
        "static_enrich": q_static_enrich,
        "trace_to_log": q_trace_to_log,
        "dedupe_events": q_dedupe_events,
        "dedupe_windowed_exact": q_dedupe_windowed_exact,
        "sample_mod": q_sample_mod,
        "sample_ratio": q_sample_ratio,
        "throttle_daily": q_throttle_daily,
        "log_to_metric_counts": q_log_to_metric_counts,
        "histogram_buckets": q_histogram_buckets,
        "summary_quantiles": q_summary_quantiles,
        "rolling_value": q_rolling_value,
        "ddsketch_buckets": q_ddsketch_buckets,
        "topk_windows": q_topk_windows,
        "reduce_sessions": q_reduce_sessions,
        "reduce_sessionized": q_reduce_sessionized,
        "reduce_gap_sessions": q_reduce_gap_sessions,
        "reduce_concat": q_reduce_concat,
        "window_context": q_window_context,
        "hopping_agg": q_hopping_agg,
        "tag_cardinality": q_tag_cardinality,
        "enrich_nation": q_enrich_nation,
        "enrich_wildcard": q_enrich_wildcard,
        "memory_enrich": q_memory_enrich,
        "pricing_summary": q_pricing_summary,
        "join_orders_customers": q_join_orders_customers,
        "salted_pricing": q_salted_pricing,
        "quality_scores": q_quality_scores,
        "text_analysis": q_text_analysis,
        "dedup_docs_exact": q_dedup_docs_exact,
        "minhash_dedup": q_minhash_dedup,
        "ngram_jaccard_dedup": q_ngram_jaccard_dedup,
        "simhash_dedup": q_simhash_dedup,
        "embedding_dedup": q_embedding_dedup,
        "ann_topk": q_ann_topk,
        "ivf_topk_full": q_ivf_topk_full,
        "ivf_index_topk": q_ivf_index_topk,
        "dd_search_filter": q_dd_search_filter,
        # --- rows-only tail (non-SQL-expressible; oracle-checked
        # siblings: sample_mod/ratio, dedupe_windowed_exact,
        # image/audio feature unit tests) ---
        "sample_hash": q_sample_hash,
        "dedupe_windowed": q_dedupe_windowed,
        "multimodal_features": q_multimodal_features,
    }


def _ensure_token_caches() -> None:
    """Materialize the synthetic token-table parquet caches the
    token_pipeline oracle reads via read_parquet(). Called from
    oracle_sql() so the files exist before ANY oracle SQL can run,
    regardless of driver ordering. Guarded: a failure here must never
    break the other 50 oracles."""
    try:
        import os

        from vector_ray.schema import token_table_path

        for n in (10_000, 100_000):
            token_table_path(n)
        # sf0.1 branch: DuckDB binds read_parquet eagerly, so the
        # n2000000 glob must match SOMETHING even before the (query-side)
        # 2M build runs.  The 0-row schema-only stub lives in its OWN
        # sibling dir (the oracle globs n2000000*/), never inside the
        # real cache dir — a stub written there could race
        # token_table_path's rmtree/replace commit and clobber a fresh
        # build.
        stub_dir = "/tmp/vector_ray_tokens/n2000000.stub"
        stub = os.path.join(stub_dir, "part-stub.parquet")
        if not os.path.exists(stub):
            import pyarrow.parquet as _pq

            from vector_ray.schema import token_batch

            os.makedirs(stub_dir, exist_ok=True)
            _pq.write_table(token_batch(0, 0), stub)
    except Exception:
        pass


# token_pipeline oracle: the flagship agg is a pure function of the
# deterministic token table (render→grok-parse inverts exactly), so the
# oracle restates parse/enrich/route directly over the cached parquet.
# The events row count selects the sf-matched cache (1000 rows ⇒ sf0.001
# ⇒ 10k token rows; 10000 ⇒ sf0.01 ⇒ 100k; else sf0.1 ⇒ 2M).  The 2M
# glob (n2000000*/) always binds thanks to a 0-row stub in a SIBLING
# dir; until the query side builds the real cache the sf0.1 oracle
# yields 0 rows — a VISIBLE row-count failure, never a silent wrong
# compare.  Only the three canonical sf sizes are defined.
_TOKEN_PIPELINE_SQL = """
WITH tok AS (
  SELECT n_tok, source, CAST(substring(doc_id, 5) AS BIGINT) AS i
  FROM read_parquet('/tmp/vector_ray_tokens/n10000/*.parquet')
  WHERE (SELECT count(*) FROM events) = 1000
  UNION ALL
  SELECT n_tok, source, CAST(substring(doc_id, 5) AS BIGINT) AS i
  FROM read_parquet('/tmp/vector_ray_tokens/n100000/*.parquet')
  WHERE (SELECT count(*) FROM events) = 10000
  UNION ALL
  SELECT n_tok, source, CAST(substring(doc_id, 5) AS BIGINT) AS i
  FROM read_parquet('/tmp/vector_ray_tokens/n2000000*/*.parquet')
  WHERE (SELECT count(*) FROM events) NOT IN (1000, 10000)
), parsed AS (
  SELECT n_tok,
         CASE WHEN i % 10 < 7 THEN 200 WHEN i % 10 < 9 THEN 404 ELSE 500 END AS status,
         CASE source WHEN 'web' THEN 'us-east' WHEN 'app' THEN 'eu-west'
                     WHEN 'syslog' THEN 'us-east' WHEN 'k8s' THEN 'ap-south'
                     WHEN 'edge' THEN 'eu-west' END AS region
  FROM tok
), routed AS (
  SELECT 'errors' AS route, * FROM parsed WHERE status = 500
  UNION ALL SELECT 'big', * FROM parsed WHERE n_tok >= 1024
  UNION ALL SELECT 'ok', * FROM parsed WHERE status IN (200, 404)
  UNION ALL SELECT '_unmatched', * FROM parsed
            WHERE status <> 500 AND n_tok < 1024 AND status NOT IN (200, 404)
)
SELECT route, region, status,
       count(*) AS n_rows,
       CAST(sum(n_tok) AS BIGINT) AS total_tokens,
       max(n_tok) AS max_tokens
FROM routed GROUP BY route, region, status
"""


def oracle_sql() -> dict[str, str]:
    _ensure_token_caches()
    return {
        "token_pipeline": _TOKEN_PIPELINE_SQL,
        "sample_ratio": (
            "SELECT event_id FROM ("
            "SELECT event_id, row_number() OVER "
            "(PARTITION BY user_id ORDER BY event_id) - 1 AS pos FROM events"
            ") WHERE floor(pos * 0.3) <> floor((pos - 1) * 0.3)"
        ),
        "dd_search_filter": (
            "SELECT event_id FROM events WHERE "
            "(event_type = 'purchase' AND value > 100) OR event_type = 'error'"
        ),
        "reduce_concat": (
            "SELECT user_id, string_agg(event_type, ' ' ORDER BY event_id) "
            "AS event_type, count(*) AS _reduce_count "
            "FROM events GROUP BY user_id"
        ),
        "enrich_wildcard": (
            "SELECT e.event_id, CASE e.event_type "
            "WHEN 'purchase' THEN 'buy' WHEN 'signup' THEN 'join' "
            "ELSE 'misc' END AS label FROM events e"
        ),
        "filter_events": (
            "SELECT event_id, user_id, value FROM events "
            "WHERE event_type = 'click' AND value > 50"
        ),
        "route_rows": (
            "SELECT event_id, 'purchase' AS route FROM events WHERE event_type = 'purchase' "
            "UNION ALL SELECT event_id, 'big' FROM events WHERE value > 150 "
            "UNION ALL SELECT event_id, '_unmatched' FROM events "
            "WHERE NOT (event_type = 'purchase' OR value > 150)"
        ),
        "exclusive_route_rows": (
            "SELECT event_id, CASE WHEN event_type = 'purchase' THEN 'purchase' "
            "WHEN value > 150 THEN 'big' ELSE '_unmatched' END AS route FROM events"
        ),
        "incremental_to_absolute": (
            "SELECT 'type=' || event_type AS tags, ts, round(sum(value) OVER "
            "(PARTITION BY event_type ORDER BY ts), 3) AS value FROM events"
        ),
        "incremental_reset": (
            "WITH m AS (SELECT user_id, ts, value, CASE WHEN event_type = 'purchase' "
            "THEN 'absolute' ELSE 'incremental' END AS kind FROM events), "
            "seg AS (SELECT *, count(CASE WHEN kind = 'absolute' THEN 1 END) OVER "
            "(PARTITION BY user_id ORDER BY ts) AS seg FROM m) "
            "SELECT 'u=' || user_id AS tags, ts, round("
            "COALESCE(MAX(CASE WHEN kind = 'absolute' THEN value END) OVER "
            "(PARTITION BY user_id, seg), 0) + "
            "SUM(CASE WHEN kind = 'incremental' THEN value ELSE 0 END) OVER "
            "(PARTITION BY user_id, seg ORDER BY ts), 3) AS value FROM seg"
        ),
        "metric_to_log_typed": (
            "SELECT 'g' AS name, 'absolute' AS kind, value AS \"gauge.value\", "
            "ts AS timestamp, 'node-1' AS host, event_type AS \"tags.type\" "
            "FROM events"
        ),
        "aggregate_latest": (
            "SELECT 'type=' || event_type AS tags, date_trunc('day', ts) AS window_start, "
            "round(arg_max(value, ts), 3) AS value, count(*) AS \"count\" "
            "FROM events GROUP BY 1, 2"
        ),
        "remap_parse_json": (
            "SELECT event_id, CAST(json_extract(props, '$.k') AS BIGINT) AS k FROM events"
        ),
        "vrl_program": (
            "WITH base AS (SELECT event_id, event_type, value, "
            "COALESCE(TRY_CAST(json_extract_string(props, '$.k') AS BIGINT), -1) AS k, "
            "CASE WHEN event_type = 'error' THEN 3 "
            "WHEN event_type = 'signup' THEN 6 ELSE 1 END AS sev FROM events) "
            "SELECT event_id, k, sev, "
            "event_type || ':' || CAST(sev AS VARCHAR) AS tag, "
            "round(value * 2 + k, 3) AS vk, "
            "(k - 50) % 7 AS m, "
            "list_transform(list_filter(string_split(event_type, 'u'), "
            "x -> x != ''), x -> upper(x)) AS up FROM base"
        ),
        "static_enrich": (
            "SELECT event_id, user_id, 'us-east-1a' AS az, 'm5.large' AS instance_type FROM events"
        ),
        "trace_to_log": (
            "SELECT event_id, event_type AS message, ts AS timestamp, 'trace' AS source_type FROM events"
        ),
        "aggregate_sequenced": (
            "WITH m AS (SELECT concat('u=', CAST(user_id AS VARCHAR)) AS tags, "
            "CASE WHEN event_type = 'purchase' THEN 'absolute' ELSE 'incremental' END AS kind, "
            "value, ts, to_timestamp(CAST(floor(epoch(ts) / 86400) AS BIGINT) * 86400)::TIMESTAMP AS window_start "
            "FROM events), "
            "lk AS (SELECT tags, window_start, max_by(kind, ts) AS last_kind FROM m GROUP BY 1, 2), "
            "bd AS (SELECT m.tags, m.window_start, max(m.ts) AS boundary FROM m "
            "JOIN lk ON m.tags = lk.tags AND m.window_start = lk.window_start "
            "WHERE m.kind <> lk.last_kind GROUP BY 1, 2) "
            "SELECT m.tags, lk.last_kind AS kind, m.window_start, "
            "round(CASE WHEN lk.last_kind = 'incremental' THEN sum(m.value) ELSE max_by(m.value, m.ts) END, 3) AS value "
            "FROM m JOIN lk ON m.tags = lk.tags AND m.window_start = lk.window_start "
            "LEFT JOIN bd ON m.tags = bd.tags AND m.window_start = bd.window_start "
            "WHERE bd.boundary IS NULL OR m.ts > bd.boundary "
            "GROUP BY m.tags, lk.last_kind, m.window_start"
        ),
        "remap_dropped": (
            "SELECT event_id, props, CAST(NULL AS BIGINT) AS k, "
            "'abort' AS \"metadata.dropped.reason\", "
            "'k out of range' AS \"metadata.dropped.message\", "
            "'guard' AS \"metadata.dropped.component_id\", "
            "'remap' AS \"metadata.dropped.component_type\", "
            "'transform' AS \"metadata.dropped.component_kind\" "
            "FROM events WHERE CAST(json_extract(props, '$.k') AS BIGINT) > 90"
        ),
        "dedupe_events": (
            "SELECT user_id, event_type, min(event_id) AS event_id "
            "FROM events GROUP BY user_id, event_type"
        ),
        "sample_mod": (
            "SELECT event_id, user_id, 10.0 AS sample_rate FROM events "
            "WHERE ((user_id * 2654435761) % 4294967296) % 10 = 0"
        ),
        "throttle_daily": (
            "SELECT event_id FROM (SELECT event_id, row_number() OVER "
            "(PARTITION BY user_id, CAST(floor(epoch(ts) / 86400) AS BIGINT) ORDER BY ts) AS rn "
            "FROM events) WHERE rn <= 3"
        ),
        "log_to_metric_counts": (
            "SELECT 'type=' || event_type AS tags, round(CAST(count(*) AS DOUBLE), 3) AS value, "
            "count(*) AS \"count\" FROM events GROUP BY event_type"
        ),
        "aggregate_hourly": (
            "SELECT 'type=' || event_type AS tags, date_trunc('hour', ts) AS window_start, "
            "round(sum(value), 3) AS value, count(*) AS \"count\" "
            "FROM events GROUP BY 1, 2"
        ),
        "histogram_buckets": (
            "WITH b AS (SELECT 'type=' || event_type AS tags, "
            "date_trunc('day', ts) AS window_start, "
            "CASE WHEN value <= 25 THEN 25.0 WHEN value <= 50 THEN 50.0 "
            "WHEN value <= 100 THEN 100.0 WHEN value <= 200 THEN 200.0 "
            "ELSE 'infinity'::DOUBLE END AS bucket_upper, value FROM events) "
            "SELECT tags, window_start, bucket_upper, "
            "count(*) AS bucket_count, "
            "CAST(sum(count(*)) OVER (PARTITION BY tags, window_start) AS BIGINT) AS \"count\", "
            "round(sum(sum(value)) OVER (PARTITION BY tags, window_start), 3) AS \"sum\" "
            "FROM b GROUP BY tags, window_start, bucket_upper"
        ),
        "summary_quantiles": (
            "WITH base AS (SELECT 'type=' || event_type AS tags, "
            "date_trunc('day', ts) AS window_start, value FROM events) "
            "SELECT tags, window_start, 0.5 AS quantile, "
            "round(quantile_cont(value, 0.5), 3) AS qvalue, count(*) AS \"count\", "
            "round(sum(value), 3) AS \"sum\" FROM base GROUP BY tags, window_start "
            "UNION ALL SELECT tags, window_start, 0.9, "
            "round(quantile_cont(value, 0.9), 3), count(*), round(sum(value), 3) "
            "FROM base GROUP BY tags, window_start"
        ),
        "reduce_sessions": (
            "SELECT user_id, count(*) AS n_events, arg_min(event_type, ts) AS event_type, "
            "round(sum(value), 3) AS value, min(event_id) AS event_id, "
            "min(ts) AS ts_start, max(ts) AS ts_end FROM events GROUP BY user_id"
        ),
        "reduce_sessionized": (
            "WITH x AS (SELECT user_id, ts, event_type, "
            "COALESCE(sum(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) OVER "
            "(PARTITION BY user_id ORDER BY ts ROWS BETWEEN UNBOUNDED PRECEDING "
            "AND 1 PRECEDING), 0) AS sid FROM events) "
            "SELECT user_id, count(*) AS n_events, min(ts) AS ts_start, "
            "max(ts) AS ts_end FROM x GROUP BY user_id, sid"
        ),
        "text_analysis": (
            "WITH w AS (SELECT doc_id, text, "
            "list_filter(regexp_split_to_array(lower(text), "
            "'[^a-zàâçéèêëîïôûùüÿñæœäöüß'']+'), x -> x <> '') AS lws, "
            "list_filter(regexp_split_to_array(lower(text), '[^a-z'']+'), x -> x <> '') AS ws "
            "FROM documents), "
            "h AS (SELECT doc_id, text, ws, lws, "
            "len(list_filter(lws, x -> x IN ('the','and','is','of','to'))) AS h_en, "
            "len(list_filter(lws, x -> x IN ('le','la','les','et','est'))) AS h_fr, "
            "len(list_filter(lws, x -> x IN ('el','los','es','y','que'))) AS h_es, "
            "len(list_filter(lws, x -> x IN ('der','die','und','ist','das'))) AS h_de, "
            "length(regexp_replace(text, '[^一-鿿]', '', 'g')) "
            "/ CAST(greatest(length(text), 1) AS DOUBLE) AS cjk FROM w) "
            "SELECT doc_id, "
            "CAST(length(regexp_split_to_array(trim(text), '\\s+')) AS BIGINT) AS n_ws_tokens, "
            "round(len(list_filter(ws, x -> x IN ('the','a','an','and','or','of','to','in',"
            "'is','are','was','were','be','been','it','this','that','with','for','on','as',"
            "'at','by','from','not','have','has','had','but','they','you','we','he','she',"
            "'his','her','its'))) / CAST(greatest(len(ws), 1) AS DOUBLE), 4) AS stop_ratio, "
            "CASE WHEN cjk > 0.2 THEN 'zh' "
            "WHEN greatest(h_en, h_fr, h_es, h_de) = 0 THEN 'und' "
            "WHEN h_en = greatest(h_en, h_fr, h_es, h_de) THEN 'en' "
            "WHEN h_fr = greatest(h_fr, h_es, h_de) THEN 'fr' "
            "WHEN h_es = greatest(h_es, h_de) THEN 'es' ELSE 'de' END AS lang_pred "
            "FROM h"
        ),
        "dedupe_windowed_exact": (
            "SELECT min(event_id) AS event_id FROM events GROUP BY user_id, event_type"
        ),
        "memory_enrich": (
            "SELECT event_id, LAG(value) OVER (PARTITION BY user_id ORDER BY event_id) "
            "AS mem_value FROM events"
        ),
        "rolling_value": (
            "SELECT event_id, round(round(sum(value) OVER w, 6), 3) AS roll_sum, "
            "round(round(avg(value) OVER w, 6), 3) AS roll_mean FROM events "
            "WINDOW w AS (PARTITION BY user_id ORDER BY ts "
            "ROWS BETWEEN 4 PRECEDING AND CURRENT ROW)"
        ),
        "ddsketch_buckets": (
            "SELECT 'type=' || event_type AS tags, date_trunc('day', ts) AS window_start, "
            "CAST(ceil(ln(value) / ln((1.0 + 0.01) / (1.0 - 0.01))) AS BIGINT) AS bucket, "
            "count(*) AS \"count\" FROM events WHERE value > 0 "
            "GROUP BY 1, 2, 3"
        ),
        "topk_windows": (
            "SELECT event_type, event_id, round(value, 3) AS value FROM events "
            "QUALIFY row_number() OVER (PARTITION BY event_type "
            "ORDER BY value DESC, event_id) <= 3"
        ),
        "reduce_gap_sessions": (
            "WITH x AS (SELECT user_id, event_id, ts, CASE WHEN "
            "epoch_us(ts) - epoch_us(lag(ts) OVER (PARTITION BY user_id ORDER BY ts)) "
            "> 21600000000 THEN 1 ELSE 0 END AS brk FROM events), "
            "y AS (SELECT user_id, event_id, ts, "
            "sum(brk) OVER (PARTITION BY user_id ORDER BY ts) AS sid FROM x) "
            "SELECT user_id, count(*) AS n_events, min(event_id) AS event_id, "
            "min(ts) AS ts_start, max(ts) AS ts_end FROM y GROUP BY user_id, sid"
        ),
        "hopping_agg": (
            "WITH w AS (SELECT event_type, value, "
            "(CAST(floor(epoch(ts) / 3600) AS BIGINT) - j) * 3600 AS ws "
            "FROM events CROSS JOIN (SELECT unnest([0, 1]) AS j)) "
            "SELECT event_type, make_timestamp(ws * 1000000) AS window_start, "
            "round(sum(value), 3) AS total, count(*) AS n "
            "FROM w WHERE ws >= 0 GROUP BY 1, 2"
        ),
        "window_context": (
            "SELECT event_id FROM (SELECT event_id, max(CASE WHEN event_type = 'error' "
            "THEN 1 ELSE 0 END) OVER (PARTITION BY user_id ORDER BY ts "
            "ROWS BETWEEN 1 PRECEDING AND 2 FOLLOWING) AS hit FROM events) WHERE hit = 1"
        ),
        "tag_cardinality": (
            "SELECT e.event_id FROM events e JOIN (SELECT user_id FROM "
            "(SELECT user_id, min(event_id) AS m FROM events GROUP BY user_id "
            "ORDER BY m LIMIT 20)) a ON e.user_id = a.user_id"
        ),
        "enrich_nation": (
            "SELECT e.event_id, n.n_name FROM events e "
            "LEFT JOIN nation n ON n.n_nationkey = e.user_id % 25"
        ),
        "join_orders_customers": (
            "SELECT c.c_mktsegment, count(*) AS n_orders, "
            "round(sum(o.o_totalprice), 2) AS total FROM orders o "
            "JOIN customer c ON o.o_custkey = c.c_custkey GROUP BY 1"
        ),
        "pricing_summary": (
            "SELECT l_returnflag, l_linestatus, round(sum(l_quantity), 2) AS sum_qty, "
            "round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_rev, "
            "round(sum(l_discount), 3) AS sum_disc, count(*) AS n "
            "FROM lineitem GROUP BY l_returnflag, l_linestatus"
        ),
        "salted_pricing": (
            "SELECT l_returnflag, count(*) AS n, round(sum(l_quantity), 2) AS sum_qty, "
            "max(l_quantity) AS max_qty FROM lineitem GROUP BY l_returnflag"
        ),
        "quality_scores": (
            "WITH w AS (SELECT doc_id, text, "
            "list_filter(regexp_split_to_array(lower(text), '[^a-z'']+'), x -> x <> '') AS ws "
            "FROM documents), "
            "m AS (SELECT doc_id, text, ws, greatest(len(ws), 1) AS nw, "
            "len(list_filter(ws, x -> x IN ('the','a','an','and','or','of','to','in','is',"
            "'are','was','were','be','been','it','this','that','with','for','on','as','at',"
            "'by','from','not','have','has','had','but','they','you','we','he','she','his',"
            "'her','its'))) AS nstop, "
            "len(list_distinct(ws)) AS nuniq, "
            "length(list_aggregate(ws, 'string_agg', '')) AS wchars, "
            "length(regexp_replace(text, '[\\w\\s]', '', 'g')) AS npunct, "
            "greatest(length(text), 1) AS nchars FROM w) "
            "SELECT doc_id, CAST(nw AS BIGINT) AS n_words, "
            "round(nstop / CAST(nw AS DOUBLE), 4) AS stop_ratio, "
            "round(nuniq / CAST(nw AS DOUBLE), 4) AS uniq_ratio, "
            "round("
            " (least(greatest(CAST(nw AS DOUBLE), 5), 500) / 500) * 0.2"
            " + ((least(greatest(wchars / CAST(nw AS DOUBLE), 2), 10) - 2) / 8) * 0.2"
            " + (1 - least(greatest(npunct / CAST(nchars AS DOUBLE), 0), 0.5) * 2) * 0.2"
            " + least(greatest(nstop / CAST(nw AS DOUBLE), 0), 0.5) * 2 * 0.2"
            " + (nuniq / CAST(nw AS DOUBLE)) * 0.2, 4) AS quality_score "
            "FROM m"
        ),
        "ivf_topk_full": (
            "WITH q AS (SELECT vec_id AS qid, embedding AS qe FROM embeddings WHERE vec_id < 3) "
            "SELECT CAST(q.qid AS BIGINT) AS query_id, e.vec_id, "
            "CAST(row_number() OVER (PARTITION BY q.qid "
            "ORDER BY list_cosine_similarity(q.qe, e.embedding) DESC, e.vec_id) AS BIGINT) AS rank "
            "FROM q CROSS JOIN embeddings e "
            "QUALIFY rank <= 10"
        ),
        "ivf_index_topk": (
            "WITH q AS (SELECT vec_id AS qid, embedding AS qe FROM embeddings WHERE vec_id < 3) "
            "SELECT CAST(q.qid AS BIGINT) AS query_id, e.vec_id, "
            "CAST(row_number() OVER (PARTITION BY q.qid "
            "ORDER BY list_cosine_similarity(q.qe, e.embedding) DESC, e.vec_id) AS BIGINT) AS rank "
            "FROM q CROSS JOIN embeddings e "
            "QUALIFY rank <= 10"
        ),
        "dedup_docs_exact": (
            "SELECT min(doc_id) AS doc_id FROM documents "
            "GROUP BY regexp_replace(lower(text), '\\s+', ' ', 'g')"
        ),
        # planted-fixture dedup: base ids are component minima by
        # construction, so the survivor set is exactly the base table
        "minhash_dedup": "SELECT doc_id FROM documents",
        "ngram_jaccard_dedup": "SELECT doc_id FROM documents",
        "simhash_dedup": "SELECT doc_id FROM documents",
        "embedding_dedup": "SELECT vec_id FROM embeddings",
        "ann_topk": (
            "WITH q AS (SELECT vec_id AS qid, embedding AS qe FROM embeddings WHERE vec_id < 3) "
            "SELECT CAST(q.qid AS BIGINT) AS query_id, e.vec_id, "
            "CAST(row_number() OVER (PARTITION BY q.qid "
            "ORDER BY list_cosine_similarity(q.qe, e.embedding) DESC, e.vec_id) AS BIGINT) AS rank "
            "FROM q CROSS JOIN embeddings e "
            "QUALIFY rank <= 10"
        ),
    }
