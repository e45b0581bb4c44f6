"""DDSketch-style mergeable quantile sketch over metric streams.

Reference parity: lib/vector-core MetricValue::Sketch (AgentDDSketch)
— the reference carries DataDog DDSketches as mergeable metric
payloads.  This is the columnar restatement of the public DDSketch
algorithm (Masson, Lee, Rim — VLDB'19): log-γ bucketing with
relative-accuracy guarantee α where γ = (1+α)/(1−α).

Columnar-first shapes:
- ``ddsketch_agg``: positive sample values → LONG-form sketch state,
  one row per (series, window, bucket) with a summed count.  Bucket
  index = ⌈log_γ(v)⌉ — deterministic, mergeable by addition, and
  recomputable by an external SQL engine (the driver oracle does).
- ``ddsketch_quantile``: sketch state → per-window quantile estimates
  (value of the bucket where the cumulative count crosses q·total;
  estimate is the γ-midpoint 2γ^b/(γ+1), the standard DDSketch
  estimator with relative error ≤ α).
- merging partial sketches = summing bucket counts, which is exactly
  what the partial-agg combiner does — no raw-value shuffle.

Zero/negative values are excluded (classic DDSketch keeps a separate
zero bucket; telemetry latencies/sizes are positive — callers filter).
"""

from __future__ import annotations

from typing import Sequence

import numpy as np
import pandas as pd
import pyarrow as pa

from .aggregate import SERIES_KEY, WIN_COL, _window
from .partial_agg import grouped_aggregate


def gamma_for_alpha(alpha: float) -> float:
    return (1.0 + alpha) / (1.0 - alpha)


def ddsketch_agg(ds, interval_ms: int = 10_000, alpha: float = 0.01,
                 ts_field: str = "ts", value_col: str = "value"):
    """Metric rows → long-form DDSketch state per (series, window):
    (name, namespace, tags, kind, window_start, bucket, count)."""
    import ray.data as rd

    gamma = gamma_for_alpha(alpha)
    lng = np.log(gamma)

    def _bucketize(batch: pa.Table) -> pa.Table:
        v = batch[value_col]
        if isinstance(v, pa.ChunkedArray):
            v = v.combine_chunks()
        vals = v.cast(pa.float64()).to_numpy(zero_copy_only=False)
        keep = vals > 0
        batch = batch.filter(pa.array(keep))
        bucket = np.ceil(np.log(vals[keep]) / lng).astype(np.int64)
        return batch.append_column("bucket", pa.array(bucket))

    windowed = _window(ds, interval_ms, ts_field)
    bucketed = windowed.map_batches(_bucketize, batch_format="pyarrow", batch_size=None)
    keys = SERIES_KEY + [WIN_COL, "bucket"]
    df = grouped_aggregate(bucketed, keys, [(value_col, "count", "count")])
    if isinstance(df, pd.DataFrame):
        df["count"] = df["count"].astype("int64")
        return rd.from_pandas(df)
    return df


def ddsketch_quantile(sketch_ds, quantiles: Sequence[float] = (0.5, 0.9, 0.99),
                      alpha: float = 0.01):
    """Long-form sketch state → per-(series, window) quantile estimates
    (standard DDSketch bucket-midpoint estimator)."""
    gamma = gamma_for_alpha(alpha)
    qs = list(quantiles)

    def _q(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("bucket", kind="mergesort")
        counts = g["count"].to_numpy()
        buckets = g["bucket"].to_numpy()
        total = counts.sum()
        cum = np.cumsum(counts)
        base = {k: g[k].iloc[0] for k in SERIES_KEY + [WIN_COL]}
        rows = []
        for q in qs:
            rank = max(1, int(np.ceil(q * total)))
            b = buckets[np.searchsorted(cum, rank)]
            est = 2.0 * gamma ** b / (gamma + 1.0)
            rows.append({**base, "quantile": q, "qvalue": est, "count": int(total)})
        return pd.DataFrame(rows)

    return sketch_ds.groupby(SERIES_KEY + [WIN_COL]).map_groups(_q, batch_format="pandas")
