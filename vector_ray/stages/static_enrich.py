"""static_enrich + trace_to_log — small projection transforms.

- ``static_enrich``: the aws_ec2_metadata analog (reference
  src/transforms/aws_ec2_metadata.rs:41-60): metadata is fetched ONCE
  on the driver (here: passed as a dict — the fetch itself is an
  environment call we do not perform), then broadcast to every batch as
  constant columns via closure capture — the ArcSwap-shared map
  re-expressed as an immutable broadcast.
- ``trace_to_log``: trace event → log event projection (reference
  src/transforms/trace_to_log.rs): traces are LogEvent-shaped already,
  so this renames span fields to log-schema names and stamps
  ``source_type``.
"""

from __future__ import annotations

from typing import Dict, Optional

import pyarrow as pa


def static_enrich(ds, fields: Dict[str, object], **kw):
    """Append constant metadata columns to every row."""

    def _add(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        for name, value in fields.items():
            if name in batch.column_names:
                batch = batch.set_column(
                    batch.column_names.index(name), name, pa.array([value] * n)
                )
            else:
                batch = batch.append_column(name, pa.array([value] * n))
        return batch

    kw.setdefault("batch_size", None)
    return ds.map_batches(_add, batch_format="pyarrow", **kw)


def trace_to_log(ds, rename: Optional[Dict[str, str]] = None, **kw):
    """Trace rows → log rows: rename span fields, stamp source_type."""
    rename = rename or {"span_name": "message", "span_ts": "timestamp"}

    def _proj(batch: pa.Table) -> pa.Table:
        batch = batch.rename_columns(
            [rename.get(c, c) for c in batch.column_names]
        )
        n = batch.num_rows
        if "source_type" in batch.column_names:
            batch = batch.set_column(
                batch.column_names.index("source_type"),
                "source_type",
                pa.array(["trace"] * n),
            )
        else:
            batch = batch.append_column("source_type", pa.array(["trace"] * n))
        return batch

    kw.setdefault("batch_size", None)
    return ds.map_batches(_proj, batch_format="pyarrow", **kw)
