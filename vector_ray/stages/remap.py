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
    ("filter", condition_str)                — hard row removal
    ("abort",  condition_str, message?)      — VRL ``abort`` analog
    ("assert", condition_str, message?)      — assert/assert_eq analog:
                                               rows FAILING the condition
                                               error out with ``message``

Failure semantics mirror the reference exactly
(remap.rs tests check_remap_error / check_remap_abort /
check_remap_branching):

* a row that errors (parse failure, failed assert) or aborts has ALL
  of the program's changes rolled back — overwritten columns revert to
  their original values, program-added columns become null — so the
  event is forwarded (or rerouted) as it arrived.  Columns *deleted*
  by drop/select are not restored (columnar-schema deviation; the
  reference restores the full original event).
* ``drop_on_error`` and ``drop_on_abort`` are independent; a flagged
  row whose flag isn't dropped stays in the primary output, rolled
  back (check_remap_error / check_remap_abort with flags false).
* ``remap_with_drops`` reroutes flagged rows to a ``dropped`` port
  annotated with ``metadata.dropped.{reason,message,component_id,
  component_type,component_kind}`` (remap.rs:564-646 + the
  check_remap_branching expected metadata).
"""

from __future__ import annotations

import json
from typing import List, Tuple

import pyarrow as pa
import pyarrow.compute as pc

from ..expr import compile_condition
from ..parse import GrokParser, RegexParser

ERROR_COL = "__error"
ABORT_COL = "__abort"
MSG_COL = "__drop_msg"
IDX_COL = "__orig_idx"
_INTERNAL = (ERROR_COL, ABORT_COL, MSG_COL)


class Remap:
    def __init__(self, steps: List[Tuple], rollback: bool = True):
        self.rollback = rollback
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
            elif op == "vrl":
                # ("vrl", source) — a full VRL program (remap.rs `source`
                # config); parsed once, vectorized per batch (vrl.py)
                from ..vrl import compile_program

                self.steps.append(("vrl", compile_program(step[1])))
            elif op == "filter":
                self.steps.append(("filter", compile_condition(step[1])))
            elif op == "abort":
                msg = step[2] if len(step) > 2 else "aborted"
                self.steps.append(("abort", compile_condition(step[1]), msg))
            elif op == "assert":
                msg = step[2] if len(step) > 2 else f"assertion failed: {step[1]}"
                self.steps.append(("assert", compile_condition(step[1]), msg))
            else:
                self.steps.append(step)

    def __call__(self, batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        orig = batch
        # row identity so rollback survives row-removing filter steps
        batch = _set(batch, IDX_COL, pa.array(range(n), type=pa.int64()))
        batch = _set(batch, ERROR_COL, pa.array([False] * n))
        batch = _set(batch, ABORT_COL, pa.array([False] * n))
        batch = _set(batch, MSG_COL, pa.array([None] * n, type=pa.string()))
        for step in self.steps:
            op = step[0]
            if op == "parse":
                _, field, parser = step
                cols, e = parser.parse(batch[field])
                for name, arr in cols.items():
                    batch = _set(batch, name, arr)
                batch = _flag(batch, ERROR_COL, e, f'error in parse of "{field}"')
            elif op == "kv":
                from ..codecs import decode_key_value

                _, field, keys, pair_sep, kv_sep = step
                t, e = decode_key_value(batch[field], keys, pair_sep, kv_sep)
                for name in t.column_names:
                    batch = _set(batch, name, t[name])
                batch = _flag(batch, ERROR_COL, e, f'error in parse_key_value of "{field}"')
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
                batch = _flag(batch, ERROR_COL, bad, f'error in parse_json of "{field}"')
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
                cols += [c for c in (*_INTERNAL, IDX_COL) if c not in cols]
                batch = batch.select(cols)
            elif op == "coerce":
                _, col, typ = step
                batch = _set(batch, col, batch[col].cast(typ))
            elif op == "filter":
                m = step[1](batch)
                if isinstance(m, pa.ChunkedArray):
                    m = m.combine_chunks()
                batch = batch.filter(m)
            elif op == "unnest":
                # ("unnest", field[, out_col]) — the `. = .events`
                # emit-multiple analog (remap.rs check_remap_emits_multiple):
                # one output row per list element, scalars repeat;
                # rollback follows each row to its source via __idx.
                # Rows already flagged bypass the expansion (execution
                # stopped at their failure) so they still reach the
                # forward/reroute path even with a null/empty list.
                from .unnest import unnest_batch

                _, field = step[:2]
                out_col = step[2] if len(step) > 2 else None
                flag = pc.or_(batch[ERROR_COL], batch[ABORT_COL])
                flag = pc.fill_null(_chunkless(flag), False)
                if pc.any(flag).as_py():
                    ok_part = unnest_batch(batch.filter(pc.invert(flag)), field, out_col)
                    flagged = batch.filter(flag)
                    # flagged rows keep one row each; the exploded
                    # column is null (its value is rolled back anyway)
                    name = out_col or field
                    elem_t = ok_part[name].type if name in ok_part.column_names else pa.string()
                    flagged = _set(
                        flagged.drop_columns([field]),
                        name,
                        pa.array([None] * flagged.num_rows, type=elem_t),
                    )
                    batch = pa.concat_tables(
                        [ok_part, flagged.select(ok_part.column_names)]
                    )
                else:
                    batch = unnest_batch(batch, field, out_col)
            elif op == "vrl":
                _, prog = step
                keep = [c for c in (*_INTERNAL, IDX_COL) if c in batch.column_names]
                internal = batch.select(keep)
                out, e, a, msgs = prog.run(batch.drop_columns(keep))
                for name in keep:
                    out = _set(out, name, internal[name])
                batch = _flag(out, ERROR_COL, pc.and_(e, pc.invert(a)), msgs)
                batch = _flag(batch, ABORT_COL, a, msgs)
            elif op == "abort":
                _, cond, msg = step
                m = pc.fill_null(_chunkless(cond(batch)), False)
                batch = _flag(batch, ABORT_COL, m, msg)
            elif op == "assert":
                _, cond, msg = step
                m = pc.invert(pc.fill_null(_chunkless(cond(batch)), False))
                batch = _flag(batch, ERROR_COL, m, msg)
            else:
                raise ValueError(f"unknown remap op {op!r}")
        if self.rollback:
            batch = self._rollback(orig, batch)
        return batch.drop_columns([IDX_COL])

    def _rollback(self, orig: pa.Table, out: pa.Table) -> pa.Table:
        """Revert all program changes on flagged rows (remap.rs
        check_remap_error: failed events forward as they arrived)."""
        flag = pc.or_(out[ERROR_COL], out[ABORT_COL])
        if not pc.any(flag).as_py():
            return out
        flag = _chunkless(flag)
        idx = _chunkless(out[IDX_COL])
        for name in out.column_names:
            if name in _INTERNAL or name == IDX_COL:
                continue
            new = _chunkless(out[name])
            if name in orig.column_names:
                old = _chunkless(orig[name]).take(idx)
                if old.type != new.type:
                    try:
                        old = old.cast(new.type)
                    except (pa.ArrowInvalid, pa.ArrowNotImplementedError):
                        continue  # incompatible coercion: keep new values
                out = _set(out, name, pc.if_else(flag, old, new))
            else:
                out = _set(out, name, pc.if_else(flag, pa.scalar(None, type=new.type), new))
        return out


def _flag(batch: pa.Table, col: str, e, msg) -> pa.Table:
    """Flag rows in ``e`` that aren't flagged yet and stamp ``msg`` on
    them (a single string or a per-row string array).  First failure
    wins: execution stops at the first error/abort in the reference, so
    an already-flagged row can't pick up a second flag from a later
    step."""
    e = pc.fill_null(_chunkless(e), True)
    cur_any = pc.or_(batch[ERROR_COL], batch[ABORT_COL])
    fresh = pc.and_(e, pc.invert(_chunkless(cur_any)))
    batch = _set(batch, col, pc.or_(batch[col], fresh))
    if isinstance(msg, (pa.Array, pa.ChunkedArray)):
        msg = pc.fill_null(_chunkless(msg), "dropped")
    else:
        msg = pa.scalar(msg, type=pa.string())
    msgs = pc.if_else(fresh, msg, _chunkless(batch[MSG_COL]))
    return _set(batch, MSG_COL, msgs)


def _chunkless(arr):
    if isinstance(arr, pa.ChunkedArray):
        return arr.combine_chunks()
    return arr


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


def remap(ds, steps, drop_on_error: bool = False, drop_on_abort: bool = False, **kw):
    """Apply a Remap; failed/aborted rows are dropped per their flag or
    forwarded rolled-back (remap.rs check_remap_error/_drop/_abort)."""
    r = Remap(steps)

    def _fn(b):
        out = r(b)
        keep = pa.array([True] * out.num_rows)
        if drop_on_error:
            keep = pc.and_(keep, pc.invert(_chunkless(out[ERROR_COL])))
        if drop_on_abort:
            keep = pc.and_(keep, pc.invert(_chunkless(out[ABORT_COL])))
        return out.filter(keep).drop_columns(list(_INTERNAL))

    return ds.map_batches(_fn, batch_format="pyarrow", **kw)


def remap_vrl(ds, source: str, **kw):
    """remap with a VRL *source program* — the reference's native config
    shape (remap.rs:52 ``source``).  Equivalent to
    ``remap(ds, [("vrl", source)], **kw)``; full drop/rollback semantics
    apply."""
    return remap(ds, [("vrl", source)], **kw)


#: dropped-port metadata layout (remap.rs check_remap_branching)
DROPPED_META = (
    "metadata.dropped.reason",
    "metadata.dropped.message",
    "metadata.dropped.component_id",
    "metadata.dropped.component_type",
    "metadata.dropped.component_kind",
)


def remap_with_drops(
    ds,
    steps,
    materialize: bool = True,
    component_id: str = "remap",
    **kw,
):
    """(ok, dropped) dataset pair — reroute_dropped semantics
    (remap.rs:564-646).  Dropped rows are rolled back to their original
    values and annotated with ``metadata.dropped.*`` columns."""
    r = Remap(steps)
    annotated = ds.map_batches(r, batch_format="pyarrow", **kw)
    if materialize:
        annotated = annotated.materialize()

    def _ok(b: pa.Table) -> pa.Table:
        keep = pc.invert(pc.or_(b[ERROR_COL], b[ABORT_COL]))
        return b.filter(keep).drop_columns(list(_INTERNAL))

    def _dropped(b: pa.Table) -> pa.Table:
        flag = pc.or_(b[ERROR_COL], b[ABORT_COL])
        d = b.filter(flag)
        reason = pc.if_else(
            _chunkless(d[ABORT_COL]),
            pa.scalar("abort", type=pa.string()),
            pa.scalar("error", type=pa.string()),
        )
        message = pc.fill_null(_chunkless(d[MSG_COL]), "dropped")
        n = d.num_rows
        d = d.drop_columns(list(_INTERNAL))
        for name, arr in zip(
            DROPPED_META,
            (
                reason,
                message,
                pa.array([component_id] * n),
                pa.array(["remap"] * n),
                pa.array(["transform"] * n),
            ),
        ):
            d = _set(d, name, arr)
        return d

    return (
        annotated.map_batches(_ok, batch_format="pyarrow"),
        annotated.map_batches(_dropped, batch_format="pyarrow"),
    )
