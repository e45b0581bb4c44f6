"""Parquet sources.

``read_parquet_fast``: file-per-task reads with plain
``pyarrow.parquet.read_table`` inside ``map_batches``.  Ray's generic
parquet scanner re-chunks wide ``list<int32>`` columns into many small
batches (measured ~16× slower than a straight pq.read_table on the
token table); reading a whole shard per task emits one right-sized
Arrow block (~128 MB) with zero re-chunking — the shape a 100 TB read
wants.  Column pruning and row-group predicate pushdown are passed
straight to pyarrow.

Use plain ``ray.data.read_parquet`` for small/narrow tables where the
scanner's splitting is harmless.
"""

from __future__ import annotations

import os
from typing import List, Optional, Sequence, Union

import pyarrow as pa
import pyarrow.parquet as pq
import ray.data as rd


def list_parquet_files(path: Union[str, Sequence[str]]) -> List[str]:
    if isinstance(path, (list, tuple)):
        out: List[str] = []
        for p in path:
            out.extend(list_parquet_files(p))
        return out
    if os.path.isdir(path):
        out = []
        for root, _dirs, files in os.walk(path):
            for f in sorted(files):
                if f.endswith(".parquet"):
                    out.append(os.path.join(root, f))
        return sorted(out)
    return [path]


def read_parquet_fast(
    path: Union[str, Sequence[str]],
    columns: Optional[List[str]] = None,
    filters=None,
    files_per_task: int = 1,
    num_cpus: Optional[float] = None,
):
    """One read task per ``files_per_task`` shards → one block per task."""
    files = list_parquet_files(path)
    if not files:
        raise FileNotFoundError(f"no parquet files under {path!r}")

    def _read(batch: pa.Table) -> pa.Table:
        # use_threads=False: tasks already run concurrently, and a
        # per-task thread pool × N tasks oversubscribes the node
        # (measured 1.55 s vs 2.15 s for 4 shards on this host)
        tables = [
            pq.read_table(p, columns=columns, filters=filters, use_threads=False)
            for p in batch["path"].to_pylist()
        ]
        return tables[0] if len(tables) == 1 else pa.concat_tables(tables)

    items = rd.from_items([{"path": f} for f in files])
    n_tasks = max(1, len(files) // files_per_task)
    kw = {"num_cpus": num_cpus} if num_cpus else {}
    return items.repartition(n_tasks).map_batches(
        _read, batch_format="pyarrow", batch_size=None, **kw
    )
