"""Distributed connected components over an edge list.

Alternating large-star / small-star contraction (Kiveris, Lattanzi,
Mirrokni, Rastogi, Vassilvitskii — "Connected Components in MapReduce
and Beyond", SoCC'14; public algorithm), expressed as Ray Data stages:

- every round is a bounded number of groupby shuffles over the EDGE
  LIST only (candidate-duplicate pairs — never the corpus), with the
  per-node min computations fully vectorized inside hash-bucketed
  groups (``groupby(bucket(u))`` keeps the Ray group count fixed at
  ``num_partitions`` while a pandas groupby inside handles the many
  per-node neighborhoods);
- converges to rooted stars: every non-root node of a component holds
  exactly one edge (node, root) where root is the component minimum;
- no driver-side union-find, no closure-captured id sets — the result
  is a Dataset(node, comp) consumed downstream by anti_join.

This replaces the round-1 driver union-find flagged in VERDICT.md
(dedup resolution is the one stage that must not materialize at
100 TB; duplicate components are small-diameter, so rounds converge
fast — ``max_rounds`` bounds the worst case).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ..functions.hashes import default_partitions, hash_columns

_PART = "__cc_part"


def _with_part(num_partitions: int, col: str = "u"):
    def _fn(batch: pa.Table) -> pa.Table:
        h = hash_columns(batch, [col])
        return batch.append_column(
            _PART, pa.array((h % np.uint64(num_partitions)).view(np.int64))
        )

    return _fn


def _canonicalize(batch: pa.Table) -> pa.Table:
    """Orient every edge (max, min), drop self-loops.  Works for int
    and string node ids (numpy elementwise compare on object arrays)."""
    u = batch["u"].to_numpy(zero_copy_only=False)
    v = batch["v"].to_numpy(zero_copy_only=False)
    hi = np.maximum(u, v)
    lo = np.minimum(u, v)
    keep = hi != lo
    t = batch["u"].type if not isinstance(batch["u"], pa.ChunkedArray) else batch["u"].type
    return pa.table({"u": pa.array(hi[keep], type=t), "v": pa.array(lo[keep], type=t)})


def _both_orientations(batch: pa.Table) -> pa.Table:
    u = batch["u"].combine_chunks() if isinstance(batch["u"], pa.ChunkedArray) else batch["u"]
    v = batch["v"].combine_chunks() if isinstance(batch["v"], pa.ChunkedArray) else batch["v"]
    return pa.table(
        {"u": pa.concat_arrays([u, v]), "v": pa.concat_arrays([v, u])}
    )


def _large_star(t: pa.Table) -> pa.Table:
    """Per node u: m = min(N(u) ∪ {u}); emit (v, m) for v ∈ N(u), v > u."""
    nt = t.schema.field("u").type
    g = t.to_pandas().drop_duplicates(["u", "v"])
    u = g["u"].to_numpy()
    v = g["v"].to_numpy()
    m = np.minimum(g.groupby("u")["v"].transform("min").to_numpy(), u)
    keep = v > u
    out_u, out_v = v[keep], m[keep]
    keep2 = out_u != out_v
    return pa.table({"u": pa.array(out_u[keep2], type=nt),
                     "v": pa.array(out_v[keep2], type=nt)})


def _small_star(t: pa.Table) -> pa.Table:
    """Edges oriented (u=max, v=min).  Per node u: m = min(N(u));
    emit (v, m) for v ∈ N(u) ∪ {u}, v ≠ m."""
    nt = t.schema.field("u").type
    g = t.to_pandas().drop_duplicates(["u", "v"])
    u = g["u"].to_numpy()
    v = g["v"].to_numpy()
    m = g.groupby("u")["v"].transform("min").to_numpy()
    per_u = g.groupby("u")["v"].min()
    out_u = np.concatenate([v, per_u.index.to_numpy()])
    out_v = np.concatenate([m, per_u.to_numpy()])
    keep = out_u != out_v
    return pa.table({"u": pa.array(out_u[keep], type=nt),
                     "v": pa.array(out_v[keep], type=nt)})


def _dedupe(t: pa.Table) -> pa.Table:
    return t.group_by(["u", "v"]).aggregate([])


def connected_components(edges, u_col: str = "a", v_col: str = "b",
                         num_partitions: int = 0, max_rounds: int = 10,
                         include_roots: bool = True):
    """Edge list Dataset → Dataset(node, comp) for every non-isolated
    node, where comp is the component's minimum node id.

    Runs alternating large-star / small-star rounds until the edge
    multiset is stable (count + order-insensitive checksum; the star
    maps are deterministic, so a stable edge set yields a stable
    multiset — duplicates never trigger an extra dedupe shuffle, the
    star group fns dedupe locally after co-locating by node).

    ``include_roots=False`` omits the (root → root) self rows — the
    dedup drop-list path only needs the non-root nodes and saves a
    shuffle.
    """
    num_partitions = num_partitions or default_partitions()
    cur = edges.map_batches(
        lambda b, uc=u_col, vc=v_col: _canonicalize(
            pa.table({"u": b[uc], "v": b[vc]})
        ),
        batch_format="pyarrow",
        batch_size=None,
    ).materialize()
    prev_sig = _signature(cur)
    for _ in range(max_rounds):
        ls_in = cur.map_batches(_both_orientations, batch_format="pyarrow", batch_size=None)
        ls_out = _grouped(ls_in, _large_star, num_partitions)
        cur = _grouped(ls_out, _small_star, num_partitions).materialize()
        sig = _signature(cur)
        if sig == prev_sig:
            break
        prev_sig = sig
    # converged star edges ARE the mapping: (node=u, comp=v); optionally
    # add the roots themselves (comp → comp) so every touched node has
    # a row
    def _mapping(batch: pa.Table) -> pa.Table:
        return pa.table({"node": batch["u"], "comp": batch["v"]})

    nodes = cur.map_batches(_mapping, batch_format="pyarrow", batch_size=None)
    if not include_roots:
        return nodes

    def _roots(t: pa.Table) -> pa.Table:
        r = t.select(["v"]).group_by(["v"]).aggregate([])["v"]
        return pa.table({"node": r, "comp": r})

    roots = _grouped(
        cur.map_batches(
            lambda b: b.append_column(_PART, pa.array(
                (hash_columns(b, ["v"]) % np.uint64(num_partitions)).view(np.int64))),
            batch_format="pyarrow", batch_size=None,
        ),
        _roots,
        num_partitions,
        pre_partitioned=True,
    )
    return nodes.union(roots)


def _grouped(ds, fn, num_partitions: int, pre_partitioned: bool = False):
    if not pre_partitioned:
        ds = ds.map_batches(_with_part(num_partitions), batch_format="pyarrow", batch_size=None)

    def _run(t: pa.Table) -> pa.Table:
        return fn(t.drop_columns([_PART]))

    return ds.groupby(_PART).map_groups(_run, batch_format="pyarrow")


def _signature(ds) -> tuple:
    """(row count, order-insensitive hash checksum) of a canonical edge
    Dataset — computed as distributed aggregates (works for any id type)."""
    cnt = ds.count()
    if cnt == 0:
        return (0, 0)
    hs = ds.map_batches(
        # mask to 32 bits: the distributed sum then stays inside int64
        # for any realistic edge count (checksum only, not identity)
        lambda b: pa.table(
            {"h": pa.array((hash_columns(b, ["u", "v"]) & np.uint64(0xFFFFFFFF)).view(np.int64))}
        ),
        batch_format="pyarrow",
        batch_size=None,
    )
    return (cnt, hs.sum("h"))
