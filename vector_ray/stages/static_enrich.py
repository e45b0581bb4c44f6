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


class RefreshingEnrich:
    """aws_ec2_metadata with refresh semantics (aws_ec2_metadata.rs:41-60:
    a background task re-fetches the metadata map every
    ``refresh_interval_secs`` and the transform reads the live
    snapshot).

    Actor-pool restatement: pass this CLASS to ``map_batches(...,
    concurrency=N)``; each actor fetches once in ``__init__`` and
    re-fetches when ``refresh_every_batches`` batches or
    ``refresh_interval_s`` seconds have passed — a mid-stream change in
    the metadata source propagates to later batches.  ``fetch_fn`` is
    the injectable environment call (the IMDS HTTP fetch in the
    reference; any picklable zero-arg callable returning a dict here).
    """

    def __init__(self, fetch_fn, refresh_every_batches: Optional[int] = None,
                 refresh_interval_s: Optional[float] = None):
        import time

        self._fetch = fetch_fn
        self._every = refresh_every_batches
        self._interval = refresh_interval_s
        self._fields = dict(fetch_fn())
        self._batches = 0
        self._last = time.time()

    def _maybe_refresh(self):
        import time

        self._batches += 1
        due = False
        if self._every is not None and self._batches >= self._every:
            due = True
        if self._interval is not None and time.time() - self._last >= self._interval:
            due = True
        if due:
            self._fields = dict(self._fetch())
            self._batches = 0
            self._last = time.time()

    def __call__(self, batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        for name, value in self._fields.items():
            arr = pa.array([value] * n)
            if name in batch.column_names:
                batch = batch.set_column(batch.column_names.index(name), name, arr)
            else:
                batch = batch.append_column(name, arr)
        self._maybe_refresh()
        return batch


def refreshing_enrich(ds, fetch_fn, refresh_every_batches=None,
                      refresh_interval_s=None, concurrency=None,
                      batch_size=None, **kw):
    from ..functions.hashes import default_pool

    concurrency = concurrency or default_pool(divisor=16)
    return ds.map_batches(
        RefreshingEnrich,
        fn_constructor_kwargs=dict(
            fetch_fn=fetch_fn,
            refresh_every_batches=refresh_every_batches,
            refresh_interval_s=refresh_interval_s,
        ),
        batch_format="pyarrow",
        concurrency=concurrency,
        batch_size=batch_size,
        **kw,
    )


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
