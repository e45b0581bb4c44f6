"""line_agg / multiline assembly — stack traces, continuation lines.

Reference: src/line_agg.rs:24-47 — four modes driven by a start
pattern and a condition pattern:

- continue_through: after a start line, lines matching the condition
  are appended; the first non-matching line flushes the aggregate and
  begins a new context (classic indented-stack-trace assembly).
- continue_past: a line matching the condition signals "the next line
  is part of me" (trailing backslash); the first non-matching line is
  appended and flushes.
- halt_before: append lines UNTIL the condition matches; the matching
  line is not consumed (it starts the next aggregate).
- halt_with: append until a line matches the condition; that line is
  included and flushes.

Assembly is inherently sequential per stream, exactly as in the
reference — so the stage shuffles once by stream key (file/source) and
runs the sequential automaton per group, sorted by ``order_by``.  The
per-line Python loop is bounded by a single stream's lines (ingest-side
operator; the reference's implementation is equally sequential).
"""

from __future__ import annotations

import re
from typing import List, Optional

import pandas as pd

MODES = ("continue_through", "continue_past", "halt_before", "halt_with")


def _assemble(lines: List[str], start_re, cond_re, mode: str):
    """Returns [(joined_text, start_line_index)] — the start index lets
    the caller take each aggregate's context columns from ITS OWN first
    line (the reference emits each aggregate with its first line's
    metadata, src/line_agg.rs logic), not the group's first row."""
    out: List[tuple] = []
    buf: List[str] = []
    start_idx = 0

    def flush():
        if buf:
            out.append(("\n".join(buf), start_idx))
            buf.clear()

    i = 0
    n = len(lines)
    while i < n:
        line = lines[i]
        if not buf:
            start_idx = i
            buf.append(line)
            i += 1
            if not start_re.search(line):
                # a line that doesn't open an aggregate passes through
                flush()
            continue
        if mode == "continue_through":
            if cond_re.search(line):
                buf.append(line)
                i += 1
            else:
                flush()
        elif mode == "continue_past":
            prev_continues = bool(cond_re.search(buf[-1]))
            if prev_continues:
                buf.append(line)
                i += 1
            else:
                flush()
        elif mode == "halt_before":
            if cond_re.search(line):
                flush()
            else:
                buf.append(line)
                i += 1
        elif mode == "halt_with":
            buf.append(line)
            i += 1
            if cond_re.search(line):
                flush()
        else:  # pragma: no cover
            raise ValueError(f"unknown line_agg mode {mode!r}")
    flush()
    return out


def line_agg(
    ds,
    start_pattern: str,
    condition_pattern: str,
    mode: str = "continue_through",
    line_col: str = "message",
    group_by: Optional[List[str]] = None,
    order_by: Optional[str] = None,
):
    """Assemble multi-line events; one output row per aggregate with the
    joined text in ``line_col`` (other columns take the first line's
    values)."""
    if mode not in MODES:
        raise ValueError(f"mode must be one of {MODES}")
    start_re = re.compile(start_pattern)
    cond_re = re.compile(condition_pattern)

    def _agg(g: pd.DataFrame) -> pd.DataFrame:
        if order_by:
            g = g.sort_values(order_by, kind="mergesort")
        merged = _assemble(g[line_col].tolist(), start_re, cond_re, mode)
        texts = [t for t, _ in merged]
        starts = [s for _, s in merged]
        # per-aggregate context: each output row carries ITS first
        # line's columns (ADVICE r2: a single g.iloc[0] overwrote the
        # 2nd..Nth aggregates' timestamps/host/level)
        heads = g.iloc[starts].reset_index(drop=True)
        out = pd.DataFrame({line_col: texts})
        for c in g.columns:
            if c != line_col and c != "__one":
                out[c] = heads[c].to_numpy()
        return out

    if group_by:
        return ds.groupby(group_by).map_groups(_agg, batch_format="pandas")
    # single stream: one group (bounded inputs only)
    ds = ds.map_batches(
        lambda b: b.append_column("__one", __import__("pyarrow").array([0] * b.num_rows)),
        batch_format="pyarrow",
    )
    # _agg already omits the __one grouping column from its output
    return ds.groupby("__one").map_groups(_agg, batch_format="pandas")
