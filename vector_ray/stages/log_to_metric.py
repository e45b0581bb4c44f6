"""log_to_metric / metric_to_log — log ⇄ metric schema projections.

Reference: src/transforms/log_to_metric.rs:45-79 (config), :140-160
(metric types), :375-520 (conversion).  Each configured metric spec
emits one metric row per matching input row:

    {"type": "counter", "field": "status", "name": "status_total",
     "namespace": "app", "increment_by_value": False,
     "tags": {"status": "{{status}}", "host": "{{host}}"}}

- counter: value = 1.0, or the field's numeric value when
  ``increment_by_value`` (log_to_metric.rs:375-420).
- gauge / histogram / summary / distribution: value = field value.
- set: value column carries the field's string value (set member).
- rows where ``field`` is null emit nothing (field-not-found skip).
- tag templates ``{{col}}`` render vectorized from columns; tags
  serialize to the canonical sorted ``k=v,k=v`` string so series
  identity matches Vector's sorted ObjectMap keys.

Output columns: (name, namespace, tags, kind, value_type, value,
set_value, ts) — METRIC_SCHEMA + set_value.
"""

from __future__ import annotations

import re
from typing import Dict, List, Optional

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

_TPL = re.compile(r"\{\{\s*(\w+)\s*\}\}")

_KIND = {  # MetricKind per metric type, log_to_metric.rs conversion
    "counter": "incremental",
    "histogram": "incremental",
    "summary": "incremental",
    "distribution": "incremental",
    "gauge": "absolute",
    "set": "incremental",
}


def _render_template(tpl: str, batch: pa.Table) -> pa.Array:
    """Render '{{col}}' templates vectorized; literal-only → constant."""
    parts = _TPL.split(tpl)  # [lit, col, lit, col, ..., lit]
    n = batch.num_rows
    if len(parts) == 1:
        return pa.array([tpl] * n, type=pa.string())
    pieces = []
    for i, p in enumerate(parts):
        if i % 2 == 0:
            if p:
                pieces.append(pa.array([p] * n, type=pa.string()))
        else:
            col = batch[p]
            if isinstance(col, pa.ChunkedArray):
                col = col.combine_chunks()
            if not pa.types.is_string(col.type):
                col = col.cast(pa.string())
            pieces.append(col)
    if len(pieces) == 1:
        return pieces[0]
    return pc.binary_join_element_wise(*pieces, "")


def _canonical_tags(tags: Dict[str, object], batch: pa.Table) -> pa.Array:
    """Sorted-key 'k=v,k=v' canonical encoding (MetricSeries identity).

    Reference render_tags semantics (log_to_metric.rs:200-260 + the
    tags test matrix):

    - a tag whose template references a column the batch does not have
      is DROPPED (count_http_requests_with_tags);
    - a tag whose value renders null on a ROW is dropped for that row
      only (TemplateRenderingError → skip), via null-skip joining;
    - a literal ``None`` config value is a BARE tag — encoded as ``k``
      with no ``=`` (multi_value_tags_yaml TagValue::Bare);
    - a LIST config value is a multi-value tag: one ``k=v`` piece per
      entry (multi_value_tags_* tests; TagValueSet full encoding);
    - a ``"*"`` / ``"prefix_*"`` key expands a struct column's fields
      into ``prefix<field>=<value>`` tags
      (count_http_requests_with_tags_expansion / colliding_dynamic_tags
      — colliding expanded keys both survive as a multi-value set).

    Pieces are ordered by (tag key, config position): deterministic per
    config, so series identity is stable.
    """
    n = batch.num_rows
    pieces: list[tuple[str, pa.Array]] = []  # (sort key, "k=v" piece)

    def _value_piece(k: str, tpl) -> None:
        if tpl is None:  # bare tag
            pieces.append((k, pa.array([k] * n, type=pa.string())))
            return
        if any(col not in batch.column_names for col in _TPL.findall(tpl)):
            return  # template render fails for every row: tag dropped
        v = _render_template(tpl, batch)
        prefix = pa.array([k + "="] * n, type=pa.string())
        pieces.append((k, pc.binary_join_element_wise(prefix, v, "", null_handling="emit_null")))

    for k, spec in tags.items():
        if k.endswith("*"):
            prefix = k[:-1]
            fields = _TPL.findall(str(spec))
            col_name = fields[0] if fields else None
            if col_name is None or col_name not in batch.column_names:
                continue
            col = batch[col_name]
            if isinstance(col, pa.ChunkedArray):
                col = col.combine_chunks()
            if not pa.types.is_struct(col.type):
                continue  # not a map-shaped field: nothing to expand
            for f in col.type:
                vals = pc.struct_field(col, f.name)
                if not pa.types.is_string(vals.type):
                    vals = vals.cast(pa.string())
                kk = prefix + f.name
                kp = pa.array([kk + "="] * n, type=pa.string())
                pieces.append(
                    (kk, pc.binary_join_element_wise(kp, vals, "", null_handling="emit_null"))
                )
        elif isinstance(spec, (list, tuple)):
            for tpl in spec:
                _value_piece(k, tpl)
        else:
            _value_piece(k, spec)

    if not pieces:
        return pa.array([""] * n, type=pa.string())
    ordered = [p for _, p in sorted(pieces, key=lambda kp: kp[0])]
    return pc.binary_join_element_wise(*ordered, ",", null_handling="skip")


def _safe_float(col: pa.Array) -> pa.Array:
    """Cast to float64 with per-row failure → null (string inputs)."""
    try:
        return col.cast(pa.float64())
    except (pa.ArrowInvalid, pa.ArrowNotImplementedError):
        vals = col.to_pylist()
        out = []
        for v in vals:
            try:
                out.append(None if v is None else float(v))
            except (TypeError, ValueError):
                out.append(None)
        return pa.array(out, type=pa.float64())


class LogToMetric:
    def __init__(self, metrics: List[dict], ts_field: Optional[str] = None):
        self.metrics = metrics
        self.ts_field = ts_field
        for m in metrics:
            if m["type"] not in _KIND:
                raise ValueError(f"unknown metric type {m['type']!r}")

    def __call__(self, batch: pa.Table) -> pa.Table:
        out = []
        n = batch.num_rows
        ts = None
        if self.ts_field and self.ts_field in batch.column_names:
            ts = batch[self.ts_field]
            if isinstance(ts, pa.ChunkedArray):
                ts = ts.combine_chunks()
        for spec in self.metrics:
            typ = spec["type"]
            field = spec.get("field")
            fcol = None
            valid = None
            if field is not None:
                if field not in batch.column_names:
                    # field-not-found: no metric emitted for this batch
                    # (log_to_metric.rs TransformError::FieldNotFound)
                    continue
                fcol = batch[field]
                if isinstance(fcol, pa.ChunkedArray):
                    fcol = fcol.combine_chunks()
                valid = pc.is_valid(fcol)
            name = _render_template(spec.get("name", field or typ), batch)
            namespace = _render_template(spec.get("namespace", ""), batch)
            tags = _canonical_tags(spec.get("tags", {}), batch)
            if typ == "counter" and not spec.get("increment_by_value"):
                value = pa.array(np.ones(n))
            elif typ == "set":
                value = pa.array(np.ones(n))
            elif fcol is not None:
                # a value that fails numeric conversion emits NO metric
                # for that row (log_to_metric.rs parse_failure test —
                # TransformError::ParseFloatError skip)
                if pa.types.is_floating(fcol.type) or pa.types.is_integer(fcol.type):
                    value = fcol.cast(pa.float64())
                else:
                    value = _safe_float(fcol)
                if valid is not None:
                    valid = pc.and_(valid, pc.is_valid(value))
            else:
                value = pa.array(np.ones(n))
            set_value = (
                fcol.cast(pa.string())
                if typ == "set" and fcol is not None
                else pa.array([None] * n, type=pa.string())
            )
            # histogram/summary/distribution rows carry a sample payload
            # (value, rate=1) — the columnar form of the reference's
            # single-sample Distribution emission
            # (src/transforms/log_to_metric.rs:375-520,
            # lib/vector-core/src/event/metric/value.rs:20-87); scalar
            # ``value`` stays populated for back-compat with scalar
            # aggregation modes.
            if typ in ("histogram", "summary", "distribution"):
                sample_rate = pa.array(np.ones(n, dtype=np.int64))
            else:
                sample_rate = pa.array([None] * n, type=pa.int64())
            # per-spec kind override (log_to_metric.rs count_absolute:
            # `kind = "absolute"` on a counter)
            kind = spec.get("kind", _KIND[typ])
            tbl = pa.table(
                {
                    "name": name,
                    "namespace": namespace,
                    "tags": tags,
                    "kind": pa.array([kind] * n, type=pa.string()),
                    "value_type": pa.array([typ] * n, type=pa.string()),
                    "value": value,
                    "sample_rate": sample_rate,
                    "set_value": set_value,
                    "ts": ts if ts is not None else pa.array([None] * n, type=pa.timestamp("us")),
                }
            )
            if valid is not None:
                tbl = tbl.filter(valid)  # null field → no metric emitted
            out.append(tbl)
        if out:
            return pa.concat_tables(out)
        # every spec skipped (field columns absent): typed empty block
        return pa.table(
            {
                "name": pa.array([], type=pa.string()),
                "namespace": pa.array([], type=pa.string()),
                "tags": pa.array([], type=pa.string()),
                "kind": pa.array([], type=pa.string()),
                "value_type": pa.array([], type=pa.string()),
                "value": pa.array([], type=pa.float64()),
                "sample_rate": pa.array([], type=pa.int64()),
                "set_value": pa.array([], type=pa.string()),
                "ts": pa.array([], type=pa.timestamp("us")),
            }
        )


def log_to_metric(ds, metrics: List[dict], ts_field: Optional[str] = None, **kw):
    return ds.map_batches(LogToMetric(metrics, ts_field), batch_format="pyarrow", **kw)


def log_to_metric_all(ds, ts_field: Optional[str] = None, **kw):
    """``all_metrics`` mode (log_to_metric.rs:140-160): each log row is a
    self-describing metric carrying ``name`` / ``kind`` / ``value`` (and
    optionally namespace / tags) — pass them through to the metric
    schema verbatim, defaulting kind=incremental / value_type=counter /
    tags="" when absent."""

    def _conv(batch: pa.Table) -> pa.Table:
        n = batch.num_rows

        def col_or(name, default, typ=pa.string()):
            if name in batch.column_names:
                c = batch[name]
                return c.combine_chunks() if isinstance(c, pa.ChunkedArray) else c
            return pa.array([default] * n, type=typ)

        ts = (
            batch[ts_field].combine_chunks()
            if ts_field and ts_field in batch.column_names
            and isinstance(batch[ts_field], pa.ChunkedArray)
            else (batch[ts_field] if ts_field and ts_field in batch.column_names
                  else pa.array([None] * n, type=pa.timestamp("us")))
        )
        return pa.table(
            {
                "name": col_or("name", ""),
                "namespace": col_or("namespace", ""),
                "tags": col_or("tags", ""),
                "kind": col_or("kind", "incremental"),
                "value_type": col_or("value_type", "counter"),
                "value": batch["value"].cast(pa.float64()),
                "set_value": col_or("set_value", None),
                "ts": ts,
            }
        )

    kw.setdefault("batch_size", None)
    return ds.map_batches(_conv, batch_format="pyarrow", **kw)


def metric_to_log(ds, **kw):
    """Inverse projection: metric rows → flat log rows.

    Reference src/transforms/metric_to_log.rs:29-60 — the metric's
    series/data fields become log fields; tags unpack to ``tag_<k>``
    columns is deferred to a remap step (tags stay canonical here).
    """

    def _proj(batch: pa.Table) -> pa.Table:
        cols = {
            "message": pc.binary_join_element_wise(
                batch["name"].combine_chunks()
                if isinstance(batch["name"], pa.ChunkedArray)
                else batch["name"],
                pa.array(["="] * batch.num_rows),
                batch["value"].cast(pa.string())
                if not isinstance(batch["value"], pa.ChunkedArray)
                else batch["value"].combine_chunks().cast(pa.string()),
                "",
            ),
            "metric_name": batch["name"],
            "namespace": batch["namespace"],
            "tags": batch["tags"],
            "kind": batch["kind"],
            "value_type": batch["value_type"],
            "value": batch["value"],
            "timestamp": batch["ts"],
        }
        return pa.table(cols)

    return ds.map_batches(_proj, batch_format="pyarrow", **kw)


def metric_to_log_typed(ds, host_tag: str | None = None, **kw):
    """Typed-payload metric → log flattening — full parity with the
    reference's field layout (src/transforms/metric_to_log.rs:419-676
    tests): the payload selected by ``value_type`` lands under its
    typed name, tags unpack to ``tags.<k>`` columns, and ``host_tag``
    (when set) promotes that tag to a top-level ``host`` field.

    Payload columns by value_type (absent columns are simply skipped;
    mixed streams produce the union of typed columns with nulls):

    - counter / gauge: ``value``            → ``counter.value`` / ``gauge.value``
    - set:             ``set_values``       → ``set.values``           (list<string>)
    - distribution:    ``samples``+``statistic``
                       → ``distribution.samples`` (list<struct{value,rate}>)
                         + ``distribution.statistic``
    - histogram:       ``buckets``+``count``+``sum``
                       → ``aggregated_histogram.buckets`` (+ .count/.sum)
    - summary:         ``quantiles``+``count``+``sum``
                       → ``aggregated_summary.quantiles`` (+ .count/.sum)
    """

    def _masked(batch: pa.Table, src: str, vt_mask, out_type=None):
        c = batch[src]
        if isinstance(c, pa.ChunkedArray):
            c = c.combine_chunks()
        if out_type is not None:
            c = c.cast(out_type)
        return pc.if_else(vt_mask, c, pa.scalar(None, type=c.type))

    def _proj(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        have = set(batch.column_names)
        vt = batch["value_type"]
        if isinstance(vt, pa.ChunkedArray):
            vt = vt.combine_chunks()
        cols: dict = {
            "name": batch["name"],
            "namespace": batch["namespace"],
            "kind": batch["kind"],
            "timestamp": batch["ts"],
        }
        present = set(pc.unique(vt).to_pylist())
        if "value" in have:
            for t, out in (("counter", "counter.value"), ("gauge", "gauge.value")):
                if t in present:
                    cols[out] = _masked(batch, "value", pc.equal(vt, t))
        if "set" in present and "set_values" in have:
            cols["set.values"] = _masked(batch, "set_values", pc.equal(vt, "set"))
        if "distribution" in present and "samples" in have:
            m = pc.equal(vt, "distribution")
            cols["distribution.samples"] = _masked(batch, "samples", m)
            if "statistic" in have:
                cols["distribution.statistic"] = _masked(batch, "statistic", m)
        if "histogram" in present and "buckets" in have:
            m = pc.equal(vt, "histogram")
            cols["aggregated_histogram.buckets"] = _masked(batch, "buckets", m)
            if "count" in have:
                cols["aggregated_histogram.count"] = _masked(batch, "count", m)
            if "sum" in have:
                cols["aggregated_histogram.sum"] = _masked(batch, "sum", m)
        if "summary" in present and "quantiles" in have:
            m = pc.equal(vt, "summary")
            cols["aggregated_summary.quantiles"] = _masked(batch, "quantiles", m)
            if "count" in have:
                cols["aggregated_summary.count"] = _masked(batch, "count", m)
            if "sum" in have:
                cols["aggregated_summary.sum"] = _masked(batch, "sum", m)

        # tags: canonical "k=v,k2=v2" string → tags.<k> columns.  Key
        # discovery per batch, then one vectorized regex extract per key
        # (no Python row loop).
        tags = batch["tags"]
        if isinstance(tags, pa.ChunkedArray):
            tags = tags.combine_chunks()
        keys: set = set()
        nonempty = pc.fill_null(tags, "")
        for kv_list in pc.split_pattern(nonempty, pattern=",").to_pylist():
            for kv in kv_list:
                if "=" in kv:
                    keys.add(kv.split("=", 1)[0])
        import re

        for k in sorted(keys):
            pat = r"(?:^|,)" + re.escape(k) + r"=(?P<v>[^,]*)"
            ext = pc.extract_regex(nonempty, pattern=pat)
            vals = pc.struct_field(ext, [0])
            out_name = "host" if host_tag is not None and k == host_tag else f"tags.{k}"
            cols[out_name] = vals
        return pa.table(cols)

    kw.setdefault("batch_size", None)
    return ds.map_batches(_proj, batch_format="pyarrow", **kw)
