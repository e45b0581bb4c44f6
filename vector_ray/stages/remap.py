"""remap transform — a compiled kernel pipeline per batch (VRL analog).

Vector's remap runs a compiled VRL program per event; failing events
can be dropped or re-routed to a ``dropped`` port (reference
src/transforms/remap.rs:52-150 config, :564-646 exec, :46 DROPPED).

Here a Remap is an ordered list of vectorized steps compiled once and
applied per Arrow batch.  Steps:

    ("parse_grok",  field, pattern)          — extract named groups
    ("parse_regex", field, regex)            — 〃 with a raw regex
    ("parse_json",  field, [keys], [types])  — extract scalar keys
    ("set",   name, fn(batch)->Array)        — computed column (UDF hook)
    ("set_literal", name, value)
    ("rename", old, new)
    ("drop",  [cols...])
    ("select", [cols...])
    ("coerce", col, arrow_type)
    ("filter", condition_str)                — abort-on-condition analog

Rows where a parse step fails get ``__error=True``; ``apply_with_drops``
splits the stream into (ok, dropped) exactly like reroute_dropped.
"""

from __future__ import annotations

import json
from typing import List, Tuple

import pyarrow as pa
import pyarrow.compute as pc

from ..expr import compile_condition
from ..parse import GrokParser, RegexParser

ERROR_COL = "__error"


class Remap:
    def __init__(self, steps: List[Tuple]):
        self.steps = []
        for step in steps:
            op = step[0]
            if op == "parse_grok":
                _, field, pattern = step
                self.steps.append(("parse", field, GrokParser(pattern)))
            elif op == "parse_regex":
                _, field, regex = step
                self.steps.append(("parse", field, RegexParser(regex)))
            elif op == "parse_url":
                from ..parse import URL_REGEX

                _, field = step
                self.steps.append(("parse", field, RegexParser(URL_REGEX, types={"port": pa.int64()})))
            elif op == "parse_key_value":
                # ("parse_key_value", field, [keys], pair_sep?, kv_sep?)
                _, field, keys = step[:3]
                pair_sep = step[3] if len(step) > 3 else ","
                kv_sep = step[4] if len(step) > 4 else "="
                self.steps.append(("kv", field, list(keys), pair_sep, kv_sep))
            elif op == "filter":
                self.steps.append(("filter", compile_condition(step[1])))
            else:
                self.steps.append(step)

    def __call__(self, batch: pa.Table) -> pa.Table:
        # carry the error flag as a live column so filter steps slice it too
        batch = _set(batch, ERROR_COL, pa.array([False] * batch.num_rows))
        for step in self.steps:
            op = step[0]
            if op == "parse":
                _, field, parser = step
                cols, e = parser.parse(batch[field])
                for name, arr in cols.items():
                    batch = _set(batch, name, arr)
                batch = _or_err(batch, e)
            elif op == "kv":
                from ..codecs import decode_key_value

                _, field, keys, pair_sep, kv_sep = step
                t, e = decode_key_value(batch[field], keys, pair_sep, kv_sep)
                for name in t.column_names:
                    batch = _set(batch, name, t[name])
                batch = _or_err(batch, e)
            elif op == "parse_json":
                _, field, keys = step[:3]
                types = step[3] if len(step) > 3 else {}
                col = batch[field]
                if isinstance(col, pa.ChunkedArray):
                    col = col.combine_chunks()
                # one json.loads per row is unavoidable without a JSON
                # kernel; keep payloads small at this stage
                parsed = [None if v is None else _loads(v) for v in col.to_pylist()]
                bad = pa.array([p is None for p in parsed])
                for k in keys:
                    vals = [None if p is None else p.get(k) for p in parsed]
                    arr = pa.array(vals, type=types.get(k))
                    batch = _set(batch, k, arr)
                batch = _or_err(batch, bad)
            elif op == "set":
                _, name, fn = step
                batch = _set(batch, name, fn(batch))
            elif op == "apply":
                # ("apply", out_col, fn_name, in_col, *args) — VRL-stdlib
                # analog via the scalar-function registry (functions/scalar.py)
                from ..functions import scalar

                _, out_name, fn_name, in_col, *args = step
                batch = _set(batch, out_name, scalar.call(fn_name, batch[in_col], *args))
            elif op == "set_literal":
                _, name, value = step
                batch = _set(batch, name, pa.array([value] * batch.num_rows))
            elif op == "rename":
                _, old, new = step
                batch = batch.rename_columns(
                    [new if c == old else c for c in batch.column_names]
                )
            elif op == "drop":
                batch = batch.drop_columns([c for c in step[1] if c in batch.column_names])
            elif op == "select":
                cols = list(step[1])
                if ERROR_COL not in cols:
                    cols.append(ERROR_COL)
                batch = batch.select(cols)
            elif op == "coerce":
                _, col, typ = step
                batch = _set(batch, col, batch[col].cast(typ))
            elif op == "filter":
                m = step[1](batch)
                if isinstance(m, pa.ChunkedArray):
                    m = m.combine_chunks()
                batch = batch.filter(m)
            else:
                raise ValueError(f"unknown remap op {op!r}")
        return batch


def _or_err(batch: pa.Table, e) -> pa.Table:
    cur = batch[ERROR_COL]
    return _set(batch, ERROR_COL, pc.or_(cur, pc.fill_null(e, True)))


def _loads(v):
    try:
        d = json.loads(v)
        return d if isinstance(d, dict) else None
    except Exception:
        return None


def _set(batch: pa.Table, name: str, arr) -> pa.Table:
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    if name in batch.column_names:
        i = batch.column_names.index(name)
        return batch.set_column(i, name, arr)
    return batch.append_column(name, arr)


def remap(ds, steps, drop_on_error: bool = False, **kw):
    """Apply a Remap; drop failed rows when drop_on_error (no dropped port)."""
    r = Remap(steps)
    if drop_on_error:
        def _fn(b):
            out = r(b)
            return out.filter(pc.invert(out[ERROR_COL])).drop_columns([ERROR_COL])
    else:
        _fn = r
    return ds.map_batches(_fn, batch_format="pyarrow", **kw)


def remap_with_drops(ds, steps, materialize: bool = True, **kw):
    """(ok, dropped) dataset pair — reroute_dropped semantics
    (remap.rs:564-646)."""
    r = Remap(steps)
    annotated = ds.map_batches(r, batch_format="pyarrow", **kw)
    if materialize:
        annotated = annotated.materialize()

    def _ok(b: pa.Table) -> pa.Table:
        return b.filter(pc.invert(b[ERROR_COL])).drop_columns([ERROR_COL])

    def _dropped(b: pa.Table) -> pa.Table:
        return b.filter(b[ERROR_COL]).drop_columns([ERROR_COL])

    return (
        annotated.map_batches(_ok, batch_format="pyarrow"),
        annotated.map_batches(_dropped, batch_format="pyarrow"),
    )
