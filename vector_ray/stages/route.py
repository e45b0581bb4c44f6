"""route / exclusive_route transforms — fan-out by condition.

Reference semantics:
- ``route``: each event is COPIED to every output whose condition
  matches; events matching nothing go to the ``_unmatched`` port when
  ``reroute_unmatched`` (default true).  src/transforms/route.rs:41-56,
  :19 (UNMATCHED_ROUTE), :74-92; behavior matrix route.rs:179-421.
- ``exclusive_route``: first-match-wins, exactly one output per event;
  fallthrough port ``_unmatched``.
  src/transforms/exclusive_route/transform.rs:44-55.

Ray Data mapping: one vectorized pass computes every route mask; each
sink is a filtered view.  Two consumption shapes:

- ``route(ds, routes)`` → dict of Datasets (one per sink).  When
  ``materialize=True`` the mask-annotated parent is pinned once so N
  sinks don't recompute the upstream (Vector's Fanout clone analog,
  lib/vector-core/src/fanout.rs:45).
- ``route_tagged(ds, routes)`` → a SINGLE dataset with rows duplicated
  per matching route and a ``__route`` label column — one streaming
  pass suitable for ``write_parquet(partition_cols=["route"])`` at
  scale (no materialization, no recompute).
"""

from __future__ import annotations

from typing import Dict

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..expr import compile_condition

UNMATCHED = "_unmatched"
MASK_PREFIX = "__route__"


def _compiled(routes: Dict[str, object]):
    if UNMATCHED in routes:
        raise ValueError(f"cannot name a route {UNMATCHED!r}")  # route.rs:64-70
    return {name: compile_condition(c) for name, c in routes.items()}


def annotate_masks(ds, routes: Dict[str, object], reroute_unmatched: bool = True):
    """Append one boolean column per route (+ _unmatched) in ONE pass."""
    conds = _compiled(routes)

    def _masks(batch: pa.Table) -> pa.Table:
        matched = None
        for name, cond in conds.items():
            m = cond(batch)
            if isinstance(m, pa.ChunkedArray):
                m = m.combine_chunks()
            batch = batch.append_column(MASK_PREFIX + name, m)
            matched = m if matched is None else pc.or_(matched, m)
        if reroute_unmatched:
            un = pc.invert(matched) if matched is not None else pa.array([True] * batch.num_rows)
            batch = batch.append_column(MASK_PREFIX + UNMATCHED, un)
        return batch

    return ds.map_batches(_masks, batch_format="pyarrow", batch_size=None)


def _strip_and_filter(name: str):
    col = MASK_PREFIX + name

    def _f(batch: pa.Table) -> pa.Table:
        m = batch[col]
        if isinstance(m, pa.ChunkedArray):
            m = m.combine_chunks()
        keep = [c for c in batch.column_names if not c.startswith(MASK_PREFIX)]
        return batch.filter(m).select(keep)

    return _f


def route(ds, routes: Dict[str, object], reroute_unmatched: bool = True, materialize: bool = True):
    """Multi-match copy routing → {route_name: Dataset}.

    materialize=True pins the annotated parent once (fan-out ≥ 2 reads
    it N times from the object store instead of recomputing upstream).
    """
    annotated = annotate_masks(ds, routes, reroute_unmatched)
    if materialize:
        annotated = annotated.materialize()
    names = list(routes) + ([UNMATCHED] if reroute_unmatched else [])
    return {
        name: annotated.map_batches(_strip_and_filter(name), batch_format="pyarrow")
        for name in names
    }


def route_tagged(ds, routes: Dict[str, object], reroute_unmatched: bool = True, **kw):
    """Single-pass routing: duplicate multi-match rows, add ``__route``.

    The scale path: the output streams straight to a partitioned sink,
    never materializing the parent.
    """
    conds = _compiled(routes)

    def _tag(batch: pa.Table) -> pa.Table:
        pieces = []
        matched = np.zeros(batch.num_rows, dtype=bool)
        for name, cond in conds.items():
            m = cond(batch)
            if isinstance(m, pa.ChunkedArray):
                m = m.combine_chunks()
            mb = np.asarray(m.to_numpy(zero_copy_only=False), dtype=bool)
            matched |= mb
            sub = batch.filter(m)
            if sub.num_rows:
                pieces.append(sub.append_column("route", pa.array([name] * sub.num_rows)))
        if reroute_unmatched and (~matched).any():
            sub = batch.filter(pa.array(~matched))
            pieces.append(sub.append_column("route", pa.array([UNMATCHED] * sub.num_rows)))
        if not pieces:
            return batch.slice(0, 0).append_column("route", pa.array([], type=pa.string()))
        return pa.concat_tables(pieces)

    return ds.map_batches(_tag, batch_format="pyarrow", batch_size=None, **kw)


def exclusive_route(ds, routes: Dict[str, object], materialize: bool = True):
    """First-match-wins routing → {route_name: Dataset} incl _unmatched."""
    tagged = exclusive_route_tagged(ds, routes)
    if materialize:
        tagged = tagged.materialize()
    out = {}
    for name in list(routes) + [UNMATCHED]:
        def _f(batch: pa.Table, _n=name) -> pa.Table:
            m = pc.equal(batch["route"], _n)
            return batch.filter(m).drop_columns(["route"])

        out[name] = tagged.map_batches(_f, batch_format="pyarrow")
    return out


def exclusive_route_tagged(ds, routes: Dict[str, object]):
    """Single ``__route`` label column, first matching condition wins."""
    conds = _compiled(routes)

    def _label(batch: pa.Table) -> pa.Table:
        label = np.full(batch.num_rows, UNMATCHED, dtype=object)
        unset = np.ones(batch.num_rows, dtype=bool)
        for name, cond in conds.items():
            m = cond(batch)
            if isinstance(m, pa.ChunkedArray):
                m = m.combine_chunks()
            mb = np.asarray(m.to_numpy(zero_copy_only=False), dtype=bool)
            hit = mb & unset
            label[hit] = name
            unset &= ~mb
        return batch.append_column("route", pa.array(label, type=pa.string()))

    return ds.map_batches(_label, batch_format="pyarrow", batch_size=None)
