"""memory enrichment table — writable, TTL'd, actor-pool state.

Reference: src/enrichment_tables/memory/ — a table that is BOTH a sink
(events written to it become k/v entries with a TTL,
memory/table.rs:316 Table impl, :394 StreamSink impl; TTL
memory/config.rs:33-34) and a lookup source.

Ray-native restatement: a ``MemoryTableActor`` pool used as a
map_batches stage.  Each batch may first UPSERT (key→attributes from
its own rows) and then LOOKUP (append enrichment columns by key).
Event-time TTL: an entry expires when ``now_ts - written_ts > ttl``.
Partitioning assumption (documented north-rule requirement): the input
is hash-partitioned by key so every occurrence of a key visits the
same actor — use ``repartition_by_key`` below before the stage when
concurrency > 1.
"""

from __future__ import annotations

from typing import Dict, List, Optional

import numpy as np
import pyarrow as pa

from ..functions.hashes import hash_string_column


class MemoryTableActor:
    """Actor: dict key → (attrs, written_ts); upsert-then-lookup per batch."""

    def __init__(
        self,
        key_field: str,
        value_fields: List[str],
        ttl_secs: Optional[float] = None,
        ts_field: Optional[str] = None,
        prefix: str = "mem_",
    ):
        self.key_field = key_field
        self.value_fields = value_fields
        self.ttl_us = int(ttl_secs * 1e6) if ttl_secs else None
        self.ts_field = ts_field
        self.prefix = prefix
        self.store: Dict[str, tuple] = {}

    def __call__(self, batch: pa.Table) -> pa.Table:
        keys = batch[self.key_field].to_pylist()
        ts = (
            batch[self.ts_field].cast(pa.timestamp("us")).cast(pa.int64()).to_pylist()
            if self.ts_field and self.ts_field in batch.column_names
            else [0] * batch.num_rows
        )
        vals = {f: batch[f].to_pylist() for f in self.value_fields if f in batch.column_names}
        out_cols: Dict[str, list] = {self.prefix + f: [] for f in self.value_fields}
        for i, k in enumerate(keys):
            entry = self.store.get(k)
            if entry is not None and self.ttl_us is not None and ts[i] - entry[1] > self.ttl_us:
                del self.store[k]
                entry = None
            for f in self.value_fields:
                out_cols[self.prefix + f].append(None if entry is None else entry[0].get(f))
            # upsert AFTER lookup: an event sees previous state, not itself
            if vals:
                self.store[k] = ({f: vals[f][i] for f in vals}, ts[i])
        for name, col in out_cols.items():
            batch = batch.append_column(name, pa.array(col))
        return batch


def repartition_by_key(ds, key_field: str, num_partitions: int):
    """Hash-partition so each key's rows land in one block → one actor.

    Uses sort-by-key-hash + repartition: rows with equal hash are
    contiguous, and the actor-pool stage processes blocks whole.  At
    cluster scale this is the explicit key-affinity shuffle the
    north rule requires for stateful stages.
    """

    def _hash(batch: pa.Table) -> pa.Table:
        h = hash_string_column(batch[key_field]) % np.uint64(num_partitions)
        return batch.append_column("__kpart", pa.array(h.view(np.int64)))

    hashed = ds.map_batches(_hash, batch_format="pyarrow", batch_size=None)
    if _hash_shuffle_enabled():
        return hashed.repartition(num_partitions, keys=["__kpart"], sort=False)
    # portable fallback: groupby keeps each __kpart's rows contiguous and
    # whole within the emitted blocks (sort-based shuffle)
    return hashed.groupby("__kpart").map_groups(lambda g: g, batch_format="pandas")


def _hash_shuffle_enabled() -> bool:
    try:
        from ray.data import DataContext
        from ray.data.context import ShuffleStrategy

        return DataContext.get_current().shuffle_strategy == ShuffleStrategy.HASH_SHUFFLE
    except Exception:
        return False


def memory_enrich(
    ds,
    key_field: str,
    value_fields: List[str],
    ttl_secs: Optional[float] = None,
    ts_field: Optional[str] = None,
    concurrency: int = 1,
    **kw,
):
    """The memory-table stage; concurrency>1 needs key-affine partitioning."""
    return ds.map_batches(
        MemoryTableActor,
        fn_constructor_kwargs=dict(
            key_field=key_field,
            value_fields=value_fields,
            ttl_secs=ttl_secs,
            ts_field=ts_field,
        ),
        batch_format="pyarrow",
        concurrency=concurrency,
        **kw,
    )
