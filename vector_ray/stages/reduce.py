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

Ray mapping: ``groupby(group_by).map_groups`` over rows sorted by
``order_by`` within the group; session splits happen inside the group
— the documented partitioning assumption is that one group's rows fit
one worker (true for transaction-shaped data).
"""

from __future__ import annotations

from typing import Dict, List, Optional

import numpy as np
import pandas as pd

from .remap import ERROR_COL  # noqa: F401  (shared convention)
from ..expr import compile_condition


def _merge_series(s: pd.Series, strategy: str):
    if strategy == "discard":
        return s.iloc[0]
    if strategy == "retain":
        return s.iloc[-1]
    if strategy == "sum":
        return s.sum()
    if strategy == "max":
        return s.max()
    if strategy == "min":
        return s.min()
    if strategy == "array":
        return list(s)
    if strategy == "concat":
        return " ".join(str(v) for v in s if v is not None)
    if strategy == "concat_newline":
        return "\n".join(str(v) for v in s if v is not None)
    if strategy == "concat_raw":
        return "".join(str(v) for v in s if v is not None)
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

    def _session_ids(group: pd.DataFrame) -> np.ndarray:
        n = len(group)
        new = np.zeros(n, dtype=bool)
        if starts is not None:
            import pyarrow as pa

            m = starts(pa.Table.from_pandas(group, preserve_index=False))
            new |= np.asarray(m.to_numpy(zero_copy_only=False), dtype=bool)
        sid = np.cumsum(new)
        if ends is not None:
            import pyarrow as pa

            m = ends(pa.Table.from_pandas(group, preserve_index=False))
            e = np.asarray(m.to_numpy(zero_copy_only=False), dtype=bool)
            # an end-marker closes the session *including* itself
            bump = np.zeros(n, dtype=np.int64)
            bump[1:] = np.cumsum(e)[:-1]
            sid = sid + bump
        if expire_after_ms and ts_field in group.columns:
            s = group[ts_field]
            if pd.api.types.is_datetime64_any_dtype(s):
                raw = s.astype("datetime64[us]").astype("int64").to_numpy()
            else:
                raw = s.astype("int64").to_numpy()
            gap_us = int(expire_after_ms) * 1000
            brk = np.zeros(n, dtype=np.int64)
            brk[1:] = (np.diff(raw) > gap_us).astype(np.int64)
            sid = sid * (n + 2) + np.cumsum(brk)
        if end_every_period_ms and ts_field in group.columns:
            s = group[ts_field]
            if pd.api.types.is_datetime64_any_dtype(s):
                raw = s.astype("datetime64[us]").astype("int64").to_numpy()
            else:
                raw = s.astype("int64").to_numpy()
            win = raw // (int(end_every_period_ms) * 1000)
            # re-base windows so combining with sid stays collision-free
            _, win_ids = np.unique(win, return_inverse=True)
            sid = sid * (int(win_ids.max()) + 2) + win_ids if n else sid
        if max_events:
            # cap session length: re-split any run longer than max_events
            out = np.zeros(n, dtype=np.int64)
            pos = 0
            last = None
            for i, s in enumerate(sid):
                if s != last:
                    last, pos = s, 0
                out[i] = pos // max_events
                pos += 1
            sid = sid * (int(out.max()) + 2) + out if n else sid
        return sid

    def _reduce(group: pd.DataFrame) -> pd.DataFrame:
        if order_by is not None:
            group = group.sort_values(order_by, kind="mergesort")
        sessions = (
            group.groupby(_session_ids(group), sort=True)
            if (starts is not None or ends is not None or max_events
                or end_every_period_ms or expire_after_ms)
            else [(0, group)]
        )
        rows = []
        for _, sess in sessions:
            row = {}
            for col in sess.columns:
                if col in group_by:
                    row[col] = sess[col].iloc[0]
                    continue
                s = sess[col]
                ts_like = pd.api.types.is_datetime64_any_dtype(s)
                if ts_like and col not in strategies:
                    row[col] = s.iloc[0]
                    row[col + "_end"] = s.iloc[-1]
                    continue
                strat = strategies.get(col) or _default_strategy(s.dtype)
                sv = s.dropna() if strat != "array" else s
                row[col] = _merge_series(sv, strat) if len(sv) else None
            row["_reduce_count"] = np.int64(len(sess))
            rows.append(row)
        return pd.DataFrame(rows)

    return ds.groupby(group_by).map_groups(_reduce, batch_format="pandas")
