"""vector_ray — a Ray-Data-native log/telemetry processing engine.

A from-scratch reimplementation of the query/data-processing
capabilities of Vector (titaneric/vector, studied read-only at
/root/reference) expressed idiomatically on ray.data.Dataset:

- sources: Parquet readers with column pruning, a demo-log generator
  (ref: src/sources/demo_logs.rs)
- transforms: filter / route / exclusive_route / remap(parse kernels) /
  dedupe / sample / throttle / log_to_metric / metric_to_log /
  aggregate / reduce / window / tag_cardinality_limit
  (ref: src/transforms/*)
- enrichment tables: broadcast hash-join + stateful actor-pool tables
  (ref: src/enrichment_tables/*, lib/enrichment/src/lib.rs)
- sinks: partitioned Parquet fan-out with per-partition manifests for
  checkpoint/resume (ref: src/sinks/file, lib/file-source-common
  checkpointer semantics re-expressed for batch)

Everything is map_batches over zero-copy Arrow batches; stateful
stages are callable classes run as actor pools.  No ray.init() is
performed inside library code.
"""

__version__ = "0.1.0"
