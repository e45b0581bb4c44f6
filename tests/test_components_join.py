"""Connected components (alternating star) and semi/anti join tests."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd

from vector_ray.stages.components import connected_components
from vector_ray.stages.join import anti_join, bucketed_join, hash_join, semi_join


def _uf_components(edges):
    parent = {}

    def find(x):
        while parent.get(x, x) != x:
            parent[x] = parent.get(parent[x], parent[x])
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    nodes = {n for e in edges for n in e}
    return {n: find(n) for n in nodes}


@pytest.mark.parametrize("seed,n_nodes,n_edges", [(0, 20, 15), (1, 50, 60), (2, 200, 150), (3, 30, 120)])
def test_connected_components_matches_union_find(ray_session, seed, n_nodes, n_edges):
    rng = np.random.default_rng(seed)
    a = rng.integers(0, n_nodes, size=n_edges).astype(np.int64)
    b = rng.integers(0, n_nodes, size=n_edges).astype(np.int64)
    edges = rd.from_arrow(pa.table({"a": a, "b": b}))
    out = connected_components(edges, num_partitions=4).to_pandas()
    got = dict(zip(out["node"], out["comp"]))
    expect = _uf_components([(x, y) for x, y in zip(a.tolist(), b.tolist()) if x != y])
    assert got == expect


def test_connected_components_empty(ray_session):
    edges = rd.from_arrow(pa.table({"a": pa.array([], type=pa.int64()),
                                    "b": pa.array([], type=pa.int64())}))
    out = connected_components(edges, num_partitions=2).to_pandas()
    assert len(out) == 0


def test_connected_components_chain(ray_session):
    # a path graph stresses multi-round convergence (diameter > 1)
    n = 40
    edges = rd.from_arrow(
        pa.table({"a": pa.array(np.arange(n - 1, dtype=np.int64)),
                  "b": pa.array(np.arange(1, n, dtype=np.int64))})
    )
    out = connected_components(edges, num_partitions=4).to_pandas()
    assert set(out["comp"]) == {0}
    assert set(out["node"]) == set(range(n))


def test_semi_anti_join_broadcast(ray_session):
    left = rd.from_arrow(pa.table({"k": pa.array([1, 2, 3, 4, 5], type=pa.int64()),
                                   "x": pa.array(list("abcde"))}))
    keys = rd.from_arrow(pa.table({"k": pa.array([2, 4, 9], type=pa.int64())}))
    kept = semi_join(left, keys, on="k").to_pandas().sort_values("k")
    assert kept["k"].tolist() == [2, 4]
    dropped = anti_join(left, keys, on="k").to_pandas().sort_values("k")
    assert dropped["k"].tolist() == [1, 3, 5]
    assert dropped["x"].tolist() == ["a", "c", "e"]


def test_anti_join_partitioned_path(ray_session):
    left = rd.from_arrow(pa.table({"k": pa.array(np.arange(100, dtype=np.int64))}))
    keys = rd.from_arrow(pa.table({"k": pa.array(np.arange(0, 100, 2, dtype=np.int64))}))
    out = anti_join(left, keys, on="k", broadcast_limit=10).to_pandas()
    assert sorted(out["k"].tolist()) == list(range(1, 100, 2))


def test_bucketed_join_left_and_collision(ray_session):
    left = rd.from_arrow(pa.table({"k": pa.array([1, 2, 3], type=pa.int64()),
                                   "val": pa.array([10, 20, 30], type=pa.int64())}))
    right = rd.from_arrow(pa.table({"k": pa.array([2, 3, 4], type=pa.int64()),
                                    "val": pa.array([200, 300, 400], type=pa.int64())}))
    out = bucketed_join(left, right, on=["k"], how="left").to_pandas().sort_values("k")
    assert out["k"].tolist() == [1, 2, 3]
    assert out["val"].tolist() == [10, 20, 30]
    got = out["val_r"].tolist()
    assert got[1:] == [200.0, 300.0] and (got[0] != got[0])  # NaN for miss


def test_hash_join_how_names(ray_session):
    left = rd.from_arrow(pa.table({"k": pa.array([1, 2, 3], type=pa.int64())}))
    right = rd.from_arrow(pa.table({"k2": pa.array([2, 3], type=pa.int64()),
                                    "y": pa.array([5, 6], type=pa.int64())}))
    out = hash_join(left, right, on=["k"], right_on=["k2"], how="left").to_pandas()
    assert len(out) == 3
