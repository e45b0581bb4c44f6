"""IP-range enrichment — the geoip/mmdb table analog as a range join.

Reference: src/enrichment_tables/geoip.rs looks up City/ISP/ASN records
by IP against MaxMind mmdb files.  The mmdb READER is unavailable in
this container, so the table here loads from a (start_ip, end_ip,
attrs...) table — the same lookup semantics (longest containing range)
expressed over explicit ranges — and the probe is a vectorized
``np.searchsorted`` over the sorted range starts, exactly the
sorted-scan strategy SURVEY §2.3 prescribes for range conditions.

To use real GeoLite2 data, convert the mmdb to CSV ranges offline and
feed it here; the stub ``from_mmdb`` raises NotImplementedError with
that instruction.
"""

from __future__ import annotations

from typing import List, Optional

import numpy as np
import pyarrow as pa

from .functions.scalar import call as scalar_call


class IpRangeTable:
    """Sorted, non-overlapping IP ranges with attribute columns."""

    def __init__(self, table: pa.Table, start_col: str = "start_ip", end_col: str = "end_ip"):
        t = table.combine_chunks()
        starts = self._ips(t[start_col])
        order = np.argsort(starts, kind="stable")
        self.starts = starts[order]
        self.ends = self._ips(t[end_col])[order]
        if (self.starts[1:] <= self.ends[:-1]).any():
            raise ValueError("overlapping IP ranges")
        self.attrs = t.drop_columns([start_col, end_col]).take(pa.array(order))

    @staticmethod
    def _ips(col) -> np.ndarray:
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        if pa.types.is_string(col.type):
            return np.asarray(
                scalar_call("ip_to_int", col).to_numpy(zero_copy_only=False), dtype=np.int64
            )
        return np.asarray(col.cast(pa.int64()).to_numpy(zero_copy_only=False))

    @classmethod
    def from_mmdb(cls, path: str):  # pragma: no cover
        raise NotImplementedError(
            "mmdb readers are not available in this environment; convert the "
            "database to (start_ip,end_ip,attrs) CSV offline and use "
            "IpRangeTable(pa_csv.read_csv(path))"
        )

    def probe(self, batch: pa.Table, ip_col: str, select: Optional[List[str]] = None) -> pa.Table:
        ips = self._ips(batch[ip_col])
        idx = np.searchsorted(self.starts, ips, side="right") - 1
        idx_clip = np.clip(idx, 0, len(self.starts) - 1)
        hit = (idx >= 0) & (ips <= self.ends[idx_clip])
        # null out misses via a validity mask — no per-row Python
        take = pa.array(idx_clip, type=pa.int64(), mask=~hit)
        for c in select or self.attrs.column_names:
            batch = batch.append_column(c, self.attrs[c].take(take))
        return batch


def ip_enrich(ds, table: IpRangeTable, ip_col: str, select: Optional[List[str]] = None, **kw):
    """Broadcast range-join enrichment stage (stateless tasks)."""

    def _probe(batch: pa.Table) -> pa.Table:
        return table.probe(batch, ip_col, select)

    kw.setdefault("batch_size", None)
    return ds.map_batches(_probe, batch_format="pyarrow", **kw)
