"""Enrichment tables — broadcast hash joins + stateful actor-pool tables.

Reference surface (lib/enrichment/src/lib.rs:51-90): a ``Table`` answers
``find_table_row(case, conditions, select, index)`` where conditions are
Equals / BetweenDates / FromDate / ToDate, all ANDed (:22-41), with
Case::Sensitive/Insensitive (:44-47).  "More than one match" is an
error (:56).  The ``file`` table pre-builds a hash index over the
equality columns (src/enrichment_tables/file.rs:425-451) and falls back
to a scan for date-range conditions (:453-472).

Ray-native mapping:

- ``EnrichTable``: an immutable pyarrow-backed table built once on the
  driver, ``ray.put`` once, probed inside stateless ``map_batches``
  with a vectorized ``pc.index_in`` hash probe — the broadcast hash
  join.  Case-insensitive keys fold both sides with utf8_lower, and
  date-range rows resolve by probe-then-validate (equality first,
  range filter second).
- ``MemoryTableActor`` (state/memory_table.py): the writable TTL'd
  ``memory`` table semantics as an actor pool.
"""

from __future__ import annotations

from typing import Dict, List, Optional

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray


def parse_schema_column(arr: pa.Array, typespec: str) -> pa.Array:
    """Apply one enrichment-schema type spec to a string column.

    Reference: src/enrichment_tables/file.rs:76-167 (FileConfig schema +
    parse_column): specs are ``string`` / ``int`` / ``float`` / ``bool``
    / ``date`` (ISO ``%Y-%m-%d``) / ``date|<fmt>`` / ``timestamp``
    (ISO8601 ``%+``) / ``timestamp|<fmt>``, tolerant of surrounding
    whitespace (``" date | %m %d %Y "`` parses).  Timestamps normalize
    to UTC and land as timestamp[us]."""
    import pandas as pd

    spec = typespec.strip()
    fmt = None
    if "|" in spec:
        spec, fmt = (p.strip() for p in spec.split("|", 1))
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    if spec == "string":
        return arr.cast(pa.string())
    if spec == "int":
        return arr.cast(pa.string()).cast(pa.int64())
    if spec == "float":
        return arr.cast(pa.string()).cast(pa.float64())
    if spec == "bool":
        lowered = pc.utf8_lower(arr.cast(pa.string()))
        return pc.equal(lowered, "true")
    if spec in ("date", "timestamp"):
        s = pd.Series(arr.to_pandas(), dtype="object")
        if spec == "date" and fmt is None:
            fmt = "%Y-%m-%d"
        if fmt is None or fmt == "%+":  # chrono %+ = ISO8601
            parsed = pd.to_datetime(s, utc=True, format="ISO8601")
        else:
            parsed = pd.to_datetime(s, format=fmt, utc=True)
        return pa.array(parsed.dt.tz_localize(None), type=pa.timestamp("us"))
    raise ValueError(f"unknown enrichment schema type {typespec!r}")


class EnrichTable:
    """Immutable lookup table with find_table_row semantics.

    key_columns: the equality-join key (the pre-built index).
    Duplicate keys are allowed at build; a probe that matches >1 row
    raises unless ``multi_ok`` (lib.rs:56 single-match rule) — except
    when date-range columns disambiguate to exactly one row.
    """

    def __init__(
        self,
        table: pa.Table,
        key_columns: List[str],
        case_sensitive: bool = True,
        valid_from: Optional[str] = None,
        valid_to: Optional[str] = None,
    ):
        self.key_columns = list(key_columns)
        self.case_sensitive = case_sensitive
        self.valid_from = valid_from
        self.valid_to = valid_to
        self.table = table.combine_chunks()
        missing = [c for c in self.key_columns if c not in self.table.column_names]
        if missing:
            # normalize_index_fields error parity (file.rs:446)
            raise ValueError(f"field(s) '{', '.join(missing)}' missing from dataset")
        self._key = self._fold(self._composite_key(self.table))
        # detect duplicate keys (legal only when a date range splits them)
        vc = pa.table({"k": self._key}).group_by("k").aggregate([("k", "count")])
        self._has_dups = pc.max(vc["k_count"]).as_py() > 1 if vc.num_rows else False

    @classmethod
    def from_csv(
        cls,
        path: str,
        key_columns: List[str],
        include_headers: bool = True,
        delimiter: str = ",",
        schema: Optional[Dict[str, str]] = None,
        **kw,
    ) -> "EnrichTable":
        """Load a CSV enrichment file (file.rs FileConfig).

        ``include_headers=False`` names columns "0", "1", … by position
        (file.rs parse_file_no_headers); ``schema`` maps column name →
        type spec, applied via parse_schema_column."""
        from pyarrow import csv as pa_csv

        read_opts = pa_csv.ReadOptions(autogenerate_column_names=not include_headers)
        parse_opts = pa_csv.ParseOptions(delimiter=delimiter)
        t = pa_csv.read_csv(path, read_options=read_opts, parse_options=parse_opts)
        if not include_headers:
            t = t.rename_columns([str(i) for i in range(t.num_columns)])
        # the reference loads every cell as a string and lets the schema
        # specs assign types (file.rs parse_column) — undo inference
        t = pa.table({c: t[c].cast(pa.string()) for c in t.column_names})
        if schema:
            for col, spec in schema.items():
                if col.strip() in t.column_names:
                    name = col.strip()
                    t = t.set_column(
                        t.column_names.index(name),
                        name,
                        parse_schema_column(t[name].cast(pa.string()), spec),
                    )
        return cls(t, key_columns, **kw)

    def _composite_key(self, t: pa.Table) -> pa.Array:
        cols = []
        for c in self.key_columns:
            col = t[c]
            if isinstance(col, pa.ChunkedArray):
                col = col.combine_chunks()
            if not pa.types.is_string(col.type):
                col = col.cast(pa.string())
            cols.append(col)
        if len(cols) == 1:
            return cols[0]
        parts = []
        for i, c in enumerate(cols):
            if i:
                parts.append(pa.array(["\x1f"] * len(c), type=pa.string()))
            parts.append(c)
        return pc.binary_join_element_wise(*parts, "")

    def _fold(self, arr: pa.Array) -> pa.Array:
        return arr if self.case_sensitive else pc.utf8_lower(arr)

    def probe(
        self,
        batch: pa.Table,
        on: List[str],
        select: Optional[List[str]] = None,
        date_field: Optional[str] = None,
        strict_single: bool = True,
        wildcard: Optional[str] = None,
    ) -> pa.Table:
        """Left-join enrichment columns onto ``batch``.

        on: batch columns aligned with key_columns.  date_field: batch
        timestamp column checked against [valid_from, valid_to].
        strict_single: raise if any probe key matches >1 table row
        after range filtering (the reference's single-match rule).
        wildcard: a key value whose table row answers probes that have
        no direct match (file.rs row_equals wildcard fallback —
        vectorized restatement: direct match wins, misses fall back).
        """
        probe_key = self._fold(
            self._composite_key(batch.select(on).rename_columns(self.key_columns))
            if on != self.key_columns
            else self._composite_key(batch)
        )
        select = select or [c for c in self.table.column_names if c not in self.key_columns]

        if not self._has_dups and date_field is None:
            idx = pc.index_in(probe_key, value_set=self._key)
            if wildcard is not None:
                wkey = wildcard if self.case_sensitive else wildcard.lower()
                widx = pc.index_in(pa.scalar(wkey, type=pa.string()),
                                   value_set=self._key)
                if widx.is_valid:
                    idx = pc.fill_null(idx, widx.as_py())
            out = batch
            for c in select:
                out = out.append_column(c, self.table[c].take(idx))
            return out

        # dup keys and/or date ranges: expand matches then validate
        import pandas as pd

        left = pd.DataFrame({"__k": probe_key.to_pandas(), "__row": np.arange(batch.num_rows)})
        right_cols = {"__k": self._key.to_pandas(), "__ridx": np.arange(self.table.num_rows)}
        right = pd.DataFrame(right_cols)
        merged = left.merge(right, on="__k", how="left")
        if date_field is not None:
            ts = batch[date_field]
            if isinstance(ts, pa.ChunkedArray):
                ts = ts.combine_chunks()
            ts_np = ts.cast(pa.timestamp("us")).cast(pa.int64()).to_numpy(zero_copy_only=False)
            merged["__ts"] = ts_np[merged["__row"].to_numpy()]
            ridx = merged["__ridx"].to_numpy()
            valid = ~np.isnan(ridx)
            ridx_i = np.where(valid, ridx, 0).astype(np.int64)
            # a NULL bound on a table row means open-ended on that side
            # (file.rs finds_row_from_date / _to_date: a condition may
            # carry only `from` or only `to`)
            if self.valid_from:
                vf_col = self.table[self.valid_from].cast(pa.timestamp("us")).cast(pa.int64())
                vf = pc.fill_null(vf_col, np.iinfo(np.int64).min).to_numpy(zero_copy_only=False)
                valid &= merged["__ts"].to_numpy() >= vf[ridx_i]
            if self.valid_to:
                vt_col = self.table[self.valid_to].cast(pa.timestamp("us")).cast(pa.int64())
                vt = pc.fill_null(vt_col, np.iinfo(np.int64).max).to_numpy(zero_copy_only=False)
                valid &= merged["__ts"].to_numpy() <= vt[ridx_i]
            merged = merged[valid | merged["__ridx"].isna()]
            if strict_single:
                counts = merged.dropna(subset=["__ridx"]).groupby("__row").size()
                if (counts > 1).any():
                    bad = counts[counts > 1].index[0]
                    raise ValueError(
                        f"enrichment key matched {counts[bad]} rows after date-range "
                        f"filtering (single-match rule): batch row {bad}"
                    )
            # rows that lost all candidates need a null placeholder
            have = set(merged["__row"])
            missing = [r for r in range(batch.num_rows) if r not in have]
            if missing:
                merged = pd.concat(
                    [merged, pd.DataFrame({"__row": missing, "__ridx": np.nan})],
                    ignore_index=True,
                )
        else:
            counts = merged.groupby("__row").size()
            if strict_single and (counts > 1).any():
                bad = counts[counts > 1].index[0]
                raise ValueError(
                    f"enrichment key matched {counts[bad]} rows (single-match rule): "
                    f"batch row {bad}"
                )
        merged = merged.sort_values("__row").drop_duplicates("__row", keep="first")
        ridx = merged["__ridx"].to_numpy()
        take_idx = pa.array(
            [None if np.isnan(r) else int(r) for r in ridx], type=pa.int64()
        )
        out = batch
        for c in select:
            out = out.append_column(c, self.table[c].take(take_idx))
        return out


def broadcast(table: EnrichTable):
    """ray.put the table once; tasks read it zero-copy from the store."""
    return ray.put(table)


def enrich(
    ds,
    table_ref,
    on: List[str],
    select: Optional[List[str]] = None,
    date_field: Optional[str] = None,
    strict_single: bool = True,
    wildcard: Optional[str] = None,
    **kw,
):
    """Broadcast-hash-join enrichment as a stateless map_batches stage.

    table_ref: an EnrichTable or an ObjectRef from broadcast() — the
    scale path ships the ref (one object-store copy per node), never
    re-serializing the table per task.
    """

    def _enrich(batch: pa.Table) -> pa.Table:
        table = _resolve_table(table_ref)
        return table.probe(
            batch, on, select=select, date_field=date_field,
            strict_single=strict_single, wildcard=wildcard,
        )

    kw.pop("concurrency", None)  # stateless tasks: no actor pool to starve
    kw.setdefault("batch_size", None)
    return ds.map_batches(_enrich, batch_format="pyarrow", **kw)


_TABLE_CACHE: dict = {}


def _resolve_table(table_ref) -> EnrichTable:
    """ray.get the broadcast table once per worker process (cached)."""
    if isinstance(table_ref, EnrichTable):
        return table_ref
    key = table_ref.hex() if hasattr(table_ref, "hex") else id(table_ref)
    t = _TABLE_CACHE.get(key)
    if t is None:
        t = ray.get(table_ref)
        _TABLE_CACHE[key] = t
    return t
