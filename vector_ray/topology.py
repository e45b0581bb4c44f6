"""Topology — config dict → validated DAG → Ray Dataset plan.

The analog of Vector's config compile + topology build
(src/config/compiler.rs:9 compile, src/config/graph.rs:242/:267
typecheck + cycle rejection, src/topology/builder.rs:124 build):

    config = {
      "sources":    {name: {"type": "parquet", "path": ...}},
      "transforms": {name: {"type": "filter", "inputs": [...], ...}},
      "sinks":      {name: {"type": "parquet", "inputs": [...], "path": ...}},
    }

Multi-output transforms (route, exclusive_route, remap with
reroute_dropped) expose named ports addressed as ``node.port`` —
Vector's output-port syntax (route.rs outputs).  Fan-out edges
(one node consumed by N>1 downstreams) materialize the parent once,
mirroring Fanout's clone (lib/vector-core/src/fanout.rs:45).

The registry is the plugin surface (analog of Vector's typetag +
inventory component registry, route.rs:124-129): ``register("type")``
decorates a builder ``fn(node_cfg, upstream_ds) -> Dataset | dict``.
User UDF hook: type "python" calls a user-supplied callable.
"""

from __future__ import annotations

from typing import Callable, Dict, List

import ray.data as rd

from . import stages
from .enrich import EnrichTable, enrich
from .functions.hashes import default_pool as _default_pool

_REGISTRY: Dict[str, Callable] = {}


def register(type_name: str):
    def deco(fn):
        _REGISTRY[type_name] = fn
        return fn

    return deco


# ----------------------------------------------------------- builders

@register("inline")
def _src_inline(cfg, _inputs):
    """Literal rows in the config — mock/test source (unit_test mock
    components analog)."""
    return rd.from_items(cfg["rows"])


@register("parquet")
def _src_parquet(cfg, _inputs):
    return rd.read_parquet(cfg["path"], columns=cfg.get("columns"))


@register("avro")
def _src_avro(cfg, _inputs):
    from .codecs import read_avro_ocf

    return rd.from_arrow(read_avro_ocf(cfg["path"]))


@register("demo_logs")
def _src_demo(cfg, _inputs):
    from .sources.demo import demo_logs

    return demo_logs(cfg.get("count", 1000), fmt=cfg.get("format", "apache_common"))


@register("tokens")
def _src_tokens(cfg, _inputs):
    from .schema import token_table_path

    return rd.read_parquet(token_table_path(cfg["rows"]))


@register("filter")
def _t_filter(cfg, inputs):
    return stages.filter_stage(inputs, cfg["condition"])


@register("route")
def _t_route(cfg, inputs):
    return stages.route(inputs, cfg["routes"], cfg.get("reroute_unmatched", True))


@register("exclusive_route")
def _t_xroute(cfg, inputs):
    return stages.exclusive_route(inputs, cfg["routes"])


@register("remap")
def _t_remap(cfg, inputs):
    # the reference's native config shape is a VRL `source` string
    # (remap.rs:52); the structured `steps` list is our columnar form —
    # either (or both, source first) drive the same kernel pipeline
    steps = list(cfg.get("steps", []))
    if cfg.get("file"):
        # remap.rs:55 `file` — VRL program read from a .vrl file,
        # mutually exclusive with `source` like the reference
        if cfg.get("source"):
            raise ValueError("remap: `source` and `file` are mutually exclusive")
        with open(cfg["file"]) as f:
            steps = [("vrl", f.read())] + steps
    if cfg.get("source"):
        steps = [("vrl", cfg["source"])] + steps
    if cfg.get("reroute_dropped"):
        ok, dropped = stages.remap_with_drops(
            inputs, steps, component_id=cfg.get("component_id", "remap")
        )
        return {"": ok, "dropped": dropped}
    return stages.remap(
        inputs,
        steps,
        drop_on_error=cfg.get("drop_on_error", False),
        drop_on_abort=cfg.get("drop_on_abort", False),
    )


@register("dedupe")
def _t_dedupe(cfg, inputs):
    if cfg.get("cache_size"):
        return stages.dedupe_windowed(
            inputs, cfg["fields"], cfg["cache_size"], cfg.get("concurrency", 1),
            order_by=cfg.get("order_by"),
        )
    return stages.dedupe_exact(
        inputs,
        cfg.get("fields"),
        order_by=cfg.get("order_by"),
        ignore=cfg.get("ignore"),
    )


@register("dedupe_timed")
def _t_dedupe_timed(cfg, inputs):
    from .stages.dedupe import dedupe_timed

    return dedupe_timed(
        inputs, cfg["fields"], cfg["ttl_ms"],
        ts_field=cfg.get("ts_field", "ts"), order_by=cfg.get("order_by"),
    )


@register("line_agg")
def _t_line_agg(cfg, inputs):
    from .stages.line_agg import line_agg

    return line_agg(
        inputs,
        start_pattern=cfg.get("start_pattern", "."),
        condition_pattern=cfg["condition_pattern"],
        mode=cfg.get("mode", "continue_through"),
        line_col=cfg.get("line_col", "message"),
        group_by=cfg.get("group_by"),
        order_by=cfg.get("order_by"),
    )


@register("unnest")
def _t_unnest(cfg, inputs):
    from .stages.unnest import unnest

    return unnest(inputs, cfg["field"], out_col=cfg.get("out_col"))


@register("sample")
def _t_sample(cfg, inputs):
    if cfg.get("key_field"):
        return stages.sample_hash(
            inputs,
            cfg["key_field"],
            rate=cfg.get("rate"),
            ratio=cfg.get("ratio"),
            exclude=cfg.get("exclude"),
            hash_fn=cfg.get("hash_fn", "stable"),
        )
    return stages.sample_count(
        inputs, cfg["rate"], group_by=cfg.get("group_by"), order_by=cfg.get("order_by")
    )


@register("throttle")
def _t_throttle(cfg, inputs):
    return stages.throttle(
        inputs,
        cfg["threshold"],
        cfg["window_secs"],
        ts_field=cfg.get("ts_field", "ts"),
        key_field=cfg.get("key_field"),
        exclude=cfg.get("exclude"),
        order_by=cfg.get("order_by"),
    )


@register("log_to_metric")
def _t_l2m(cfg, inputs):
    if cfg.get("all_metrics"):
        from .stages.log_to_metric import log_to_metric_all

        return log_to_metric_all(inputs, ts_field=cfg.get("ts_field"))
    return stages.log_to_metric(inputs, cfg["metrics"], ts_field=cfg.get("ts_field"))


@register("metric_to_log")
def _t_m2l(cfg, inputs):
    if cfg.get("typed_payloads"):
        from .stages.log_to_metric import metric_to_log_typed

        return metric_to_log_typed(inputs, host_tag=cfg.get("host_tag"))
    return stages.metric_to_log(inputs)


@register("decode")
def _t_decode(cfg, inputs):
    """``decoding.codec`` analog (reference source decoding configs,
    lib/codecs/src/decoding/mod.rs): decode one byte/string column with
    a named wire-format decoder; the decoded rows REPLACE the stream.
    Codecs: native | native_json | influxdb | gelf | syslog."""
    codec = cfg["codec"]
    field = cfg.get("field", "message")
    from . import codecs as C

    table_decoders = {
        "native": C.decode_native,
        "native_json": C.decode_native_json,
        "influxdb": C.decode_influxdb,
        "gelf": C.decode_gelf,
        "syslog": C.decode_syslog,
        # schema-inferring json: bad rows produce no output rows, so the
        # (table, err) mask doesn't align with the table — take rows only
        "json": lambda col: C.decode_json_auto(col)[0],
    }
    if codec not in table_decoders:
        raise ValueError(f"decode: unknown codec {codec!r} "
                         f"(have {sorted(table_decoders)})")
    dec = table_decoders[codec]

    def _apply(batch):
        out = dec(batch[field])
        if isinstance(out, tuple):  # (table, err_mask) decoders: drop bad frames
            import pyarrow.compute as _pc

            t, err = out
            return t.filter(_pc.invert(_pc.fill_null(err, True)))
        return out

    return inputs.map_batches(_apply, batch_format="pyarrow", batch_size=None)


@register("aggregate")
def _t_agg(cfg, inputs):
    if cfg.get("mode") == "auto_sequenced":
        return stages.aggregate_sequenced(
            inputs, interval_ms=cfg.get("interval_ms", 10_000)
        )
    return stages.aggregate(
        inputs, mode=cfg.get("mode", "auto"), interval_ms=cfg.get("interval_ms", 10_000)
    )


@register("reduce")
def _t_reduce(cfg, inputs):
    return stages.reduce_stage(
        inputs,
        cfg["group_by"],
        merge_strategies=cfg.get("merge_strategies"),
        order_by=cfg.get("order_by"),
        starts_when=cfg.get("starts_when"),
        ends_when=cfg.get("ends_when"),
        max_events=cfg.get("max_events"),
        end_every_period_ms=cfg.get("end_every_period_ms"),
        expire_after_ms=cfg.get("expire_after_ms"),
        ts_field=cfg.get("ts_field", "ts"),
    )


@register("window")
def _t_window(cfg, inputs):
    return stages.window_stage(
        inputs,
        cfg["flush_when"],
        cfg["group_by"],
        cfg["order_by"],
        num_events_before=cfg.get("num_events_before", 5),
        num_events_after=cfg.get("num_events_after", 5),
        forward_when=cfg.get("forward_when"),
    )


@register("tag_cardinality_limit")
def _t_tagcard(cfg, inputs):
    """`sequential = true` (or per-metric limits, which need scoped
    sequential state) runs the reference-order-exact single-pass
    limiter; the default two-phase path is the distributed shape."""
    if cfg.get("sequential", False) or cfg.get("per_metric"):
        from .stages.tag_cardinality import tag_cardinality_limit_sequential

        return tag_cardinality_limit_sequential(
            inputs,
            cfg["tag_columns"],
            cfg["value_limit"],
            cfg["order_by"],
            limit_exceeded_action=cfg.get("limit_exceeded_action", "drop_tag"),
            mode=cfg.get("mode", "exact"),
            per_metric_limits=cfg.get("per_metric"),
            metric_name_col=cfg.get("metric_name_col", "name"),
        )
    return stages.tag_cardinality_limit(
        inputs,
        cfg["tag_columns"],
        cfg["value_limit"],
        cfg["order_by"],
        limit_exceeded_action=cfg.get("limit_exceeded_action", "drop_tag"),
        mode=cfg.get("mode", "exact"),
    )


@register("ddsketch")
def _t_ddsketch(cfg, inputs):
    from .stages.sketch import ddsketch_agg

    return ddsketch_agg(
        inputs, interval_ms=cfg.get("interval_ms", 10_000),
        alpha=cfg.get("alpha", 0.01), ts_field=cfg.get("ts_field", "ts"),
        value_col=cfg.get("value_col", "value"),
    )


@register("topk")
def _t_topk(cfg, inputs):
    from .stages.topk import topk_per_group

    return topk_per_group(
        inputs, cfg["group_by"], cfg["value_col"], cfg["k"],
        ascending=cfg.get("ascending", False), tie_col=cfg.get("tie_col"),
    )


@register("distribution_agg")
def _t_distribution_agg(cfg, inputs):
    from .stages.metric_payload import distribution_agg

    return distribution_agg(
        inputs, interval_ms=cfg.get("interval_ms", 10_000),
        ts_field=cfg.get("ts_field", "ts"),
    )


@register("aggregated_histogram")
def _t_aggregated_histogram(cfg, inputs):
    from .stages.metric_payload import aggregated_histogram

    return aggregated_histogram(inputs, limits=cfg["limits"])


@register("aggregated_summary")
def _t_aggregated_summary(cfg, inputs):
    from .stages.metric_payload import aggregated_summary

    return aggregated_summary(inputs, quantiles=cfg.get("quantiles", (0.5, 0.9, 0.99)))


@register("incremental_to_absolute")
def _t_inc2abs(cfg, inputs):
    return stages.incremental_to_absolute(inputs, ts_field=cfg.get("ts_field", "ts"))


@register("enrich")
def _t_enrich(cfg, inputs):
    table = cfg.get("_table")
    if table is None:
        table = EnrichTable.from_csv(
            cfg["path"], cfg["key_columns"], case_sensitive=cfg.get("case_sensitive", True)
        )
    return enrich(
        inputs,
        table,
        on=cfg["on"],
        select=cfg.get("select"),
        date_field=cfg.get("date_field"),
        strict_single=cfg.get("strict_single", True),
    )


@register("csv")
def _src_csv(cfg, _inputs):
    return rd.read_csv(cfg["path"])


@register("json")
def _src_json(cfg, _inputs):
    return rd.read_json(cfg["path"])


@register("text")
def _src_text(cfg, _inputs):
    """Line-framed text file source (newline framing, file.rs analog)."""
    return rd.read_text(cfg["path"])


@register("framed")
def _src_framed(cfg, _inputs):
    """File source with an explicit framing method (§2.6 framers):
    ``framing`` = newline | character_delimited | length_delimited |
    varint_length_delimited | octet_counting, plus method options
    (delimiter, max_length, length_size)."""
    from functools import partial

    from . import framing as fr

    method = cfg.get("framing", "newline")
    if method == "newline":
        framer = partial(fr.frame_newline, max_length=cfg.get("max_length"))
    elif method == "character_delimited":
        framer = partial(
            fr.frame_character_delimited,
            delimiter=cfg["delimiter"].encode(),
            max_length=cfg.get("max_length"),
        )
    elif method == "length_delimited":
        framer = partial(fr.frame_length_delimited, length_size=cfg.get("length_size", 4))
    elif method == "varint_length_delimited":
        framer = fr.frame_varint_length_delimited
    elif method == "octet_counting":
        framer = partial(fr.frame_octet_counting, max_length=cfg.get("max_length"))
    else:
        raise ValueError(f"unknown framing method {method!r}")
    ds = fr.framed_source(cfg["path"], framer, as_string=cfg.get("as_string", True))
    if cfg.get("decoding"):
        # reference source configs pair framing with decoding
        # (lib/codecs/src/decoding/mod.rs Decoder = framer + deserializer)
        return _t_decode({"codec": cfg["decoding"], "field": "message"}, ds)
    return ds


@register("static_enrich")
def _t_static(cfg, inputs):
    from .stages.static_enrich import static_enrich

    return static_enrich(inputs, cfg["fields"])


@register("trace_to_log")
def _t_trace(cfg, inputs):
    from .stages.static_enrich import trace_to_log

    return trace_to_log(inputs, rename=cfg.get("rename"))


@register("ip_enrich")
def _t_ip_enrich(cfg, inputs):
    from .enrich_ip import IpRangeTable, ip_enrich

    table = cfg.get("_table")
    if table is None:
        from pyarrow import csv as pa_csv

        table = IpRangeTable(pa_csv.read_csv(cfg["path"]))
    return ip_enrich(inputs, table, cfg["ip_col"], select=cfg.get("select"))


@register("hopping_agg")
def _t_hopping(cfg, inputs):
    import ray.data as _rd

    from .stages.windowed_agg import hopping_agg

    from .stages.partial_agg import as_dataset

    res = hopping_agg(
        inputs,
        cfg["keys"],
        [tuple(a) for a in cfg["aggs"]],
        ts_field=cfg.get("ts_field", "ts"),
        size_ms=cfg["size_ms"],
        slide_ms=cfg.get("slide_ms", cfg["size_ms"]),
    )
    return as_dataset(res)


@register("sort")
def _t_sort(cfg, inputs):
    return inputs.sort(cfg["key"], descending=cfg.get("descending", False))


@register("limit")
def _t_limit(cfg, inputs):
    return inputs.limit(cfg["n"])


# ------------------------------------------------- LLM-data pipelines
# The training-data operators (pipelines/dedup.py, ann.py, multimodal.py,
# functions/text.py) exposed as first-class config types, same status as
# every §2 transform — a config-driven user reaches them without Python.


@register("exact_dedup")
def _t_exact_dedup(cfg, inputs):
    from .pipelines.dedup import exact_dedup

    return exact_dedup(
        inputs, text_col=cfg.get("text_col", "text"), id_col=cfg.get("id_col", "doc_id")
    )


@register("minhash_dedup")
def _t_minhash_dedup(cfg, inputs):
    from .pipelines.dedup import minhash_lsh_dedup

    return minhash_lsh_dedup(
        inputs,
        num_perm=cfg.get("num_perm", 64),
        bands=cfg.get("bands", 16),
        shingle_k=cfg.get("shingle_k", 5),
        jaccard_threshold=cfg.get("jaccard_threshold", 0.7),
        text_col=cfg.get("text_col", "text"),
        id_col=cfg.get("id_col", "doc_id"),
    )


@register("simhash_dedup")
def _t_simhash_dedup(cfg, inputs):
    from .pipelines.dedup import simhash_dedup

    return simhash_dedup(
        inputs,
        hamming_k=cfg.get("hamming_k", 3),
        text_col=cfg.get("text_col", "text"),
        id_col=cfg.get("id_col", "doc_id"),
    )


@register("ngram_jaccard_dedup")
def _t_ngram_dedup(cfg, inputs):
    from .pipelines.dedup import ngram_jaccard_dedup

    return ngram_jaccard_dedup(
        inputs,
        n=cfg.get("n", 3),
        threshold=cfg.get("threshold", 0.8),
        text_col=cfg.get("text_col", "text"),
        id_col=cfg.get("id_col", "doc_id"),
    )


@register("embedding_dedup")
def _t_embedding_dedup(cfg, inputs):
    from .pipelines.dedup import embedding_dedup

    return embedding_dedup(
        inputs,
        threshold=cfg.get("threshold", 0.95),
        vec_col=cfg.get("vec_col", "embedding"),
        id_col=cfg.get("id_col", "vec_id"),
        n_planes=cfg.get("n_planes", 12),
    )


def _config_queries(cfg):
    """ANN query vectors from config: inline `queries: [[...], ...]` or
    a single-column parquet at `queries_path`."""
    import numpy as np

    if cfg.get("queries") is not None:
        return np.asarray(cfg["queries"], dtype="float32")
    import pyarrow.parquet as pq

    t = pq.read_table(cfg["queries_path"])
    col = cfg.get("queries_col", t.column_names[0])
    return np.asarray(t[col].to_pylist(), dtype="float32")


@register("ann_topk")
def _t_ann_topk(cfg, inputs):
    from .pipelines.ann import brute_force_topk

    return brute_force_topk(
        inputs,
        _config_queries(cfg),
        k=cfg.get("k", 10),
        vec_col=cfg.get("vec_col", "embedding"),
        id_col=cfg.get("id_col", "vec_id"),
    )


@register("ivf_topk")
def _t_ivf_topk(cfg, inputs):
    """With `index_dir`, searches a MATERIALIZED list-partitioned index
    (building it on first use) so only the probed partitions are read;
    without it, the one-shot full-scan prototype."""
    import os

    from .pipelines.ann import build_ivf_index, ivf_search, ivf_topk

    queries = _config_queries(cfg)
    common = dict(
        k=cfg.get("k", 10),
        nprobe=cfg.get("nprobe", 4),
        vec_col=cfg.get("vec_col", "embedding"),
        id_col=cfg.get("id_col", "vec_id"),
    )
    index_dir = cfg.get("index_dir")
    if index_dir:
        # Rebuild when (a) no index exists, (b) `rebuild = true`, or
        # (c) the input dataset's file fingerprint changed since the
        # index was built — otherwise a grown/changed corpus would
        # silently serve stale top-k from the old materialized index.
        # Fingerprint = hash of the source file list (cheap, metadata
        # only); inputs with no file lineage (inline/post-transform)
        # get no auto-guard, so `rebuild` is the escape hatch there.
        import hashlib
        import json as _json

        fp_path = os.path.join(index_dir, "fingerprint.json")
        try:
            files = sorted(inputs.input_files())
        except Exception:
            files = []
        fingerprint = (
            hashlib.sha1("\n".join(files).encode()).hexdigest() if files else None
        )
        stale = False
        if os.path.exists(fp_path) and fingerprint is not None:
            with open(fp_path) as f:
                stale = _json.load(f).get("fingerprint") != fingerprint
        if (
            cfg.get("rebuild", False)
            or stale
            or not os.path.exists(os.path.join(index_dir, "centroids.parquet"))
        ):
            build_ivf_index(
                inputs, index_dir,
                n_lists=cfg.get("n_lists", 16),
                vec_col=common["vec_col"], id_col=common["id_col"],
            )
            with open(fp_path, "w") as f:
                _json.dump({"fingerprint": fingerprint, "files": len(files)}, f)
        return ivf_search(index_dir, queries, **common)
    return ivf_topk(inputs, queries, n_lists=cfg.get("n_lists", 16), **common)


@register("text_analysis")
def _t_text_analysis(cfg, inputs):
    """token counting / quality scoring / language-ID / fingerprinting —
    pick stages with `analyses: [tokens, quality, lang, fingerprint]`
    (default: all)."""
    from .functions.text import LangId, QualityScorer, fingerprint, token_counts

    which = set(cfg.get("analyses", ["tokens", "quality", "lang", "fingerprint"]))
    text_col = cfg.get("text_col", "text")
    pool = _default_pool(divisor=16)
    ds = inputs
    if "tokens" in which:
        ds = ds.map_batches(
            lambda b: token_counts(b, text_col=text_col), batch_format="pyarrow"
        )
    if "quality" in which:
        ds = ds.map_batches(
            QualityScorer, batch_format="pyarrow", concurrency=pool,
            fn_constructor_kwargs=(
                {"text_col": text_col} if text_col != "text" else {}
            ),
        )
    if "lang" in which:
        ds = ds.map_batches(
            LangId, batch_format="pyarrow", concurrency=pool,
            fn_constructor_kwargs=(
                {"text_col": text_col} if text_col != "text" else {}
            ),
        )
    if "fingerprint" in which:
        ds = ds.map_batches(
            lambda b: fingerprint(b, text_col=text_col), batch_format="pyarrow"
        )
    return ds


@register("image_features")
def _t_image_features(cfg, inputs):
    from .pipelines.multimodal import image_features

    return image_features(inputs, batch_size=cfg.get("batch_size", 128))


@register("audio_features")
def _t_audio_features(cfg, inputs):
    from .pipelines.multimodal import audio_features

    return audio_features(inputs, batch_size=cfg.get("batch_size", 128))


@register("resize_images")
def _t_resize_images(cfg, inputs):
    from .pipelines.multimodal import resize_images

    return resize_images(
        inputs, cfg["width"], cfg["height"], batch_size=cfg.get("batch_size", 64)
    )


@register("sample_frames")
def _t_sample_frames(cfg, inputs):
    from .pipelines.multimodal import sample_frames

    return sample_frames(
        inputs, every_ms=cfg.get("every_ms", 500), batch_size=cfg.get("batch_size", 64)
    )


@register("python")
def _t_python(cfg, inputs):
    """User-extension hook (lua-transform analog): a callable operating
    on the Dataset or per batch.

    Lifecycle hooks (reference src/transforms/lua/v2/mod.rs:28-79 —
    hooks.init / hooks.process / hooks.shutdown): pass ``init`` /
    ``process`` / ``shutdown`` callables instead of ``fn`` and the
    transform runs as an actor pool — ``init()`` once per actor (its
    return value is the state threaded into every call),
    ``process(batch, state) -> batch`` per batch, ``shutdown(state)``
    at actor teardown (side effects only: the streaming model has no
    terminal emit slot).

    Timers (src/transforms/lua/v2/mod.rs:28-79 timer_hooks): pass
    ``timer`` = {"interval_ms": N, "hook": fn(state, fire_ts_us) ->
    list[dict] | None} and the hook fires once per elapsed EVENT-TIME
    interval (observed via ``ts_field``, default "ts"); returned rows
    are appended to the stream, null-padded to the union schema.  The
    reference runs exactly one Lua VM over an ordered stream, so a
    timer forces concurrency=1 AND event-time-ordered single-partition
    delivery (sort + repartition(1)) — without it Ray delivers blocks
    in arbitrary order (preserve_order defaults off) and boundary
    fires between out-of-order batches are silently skipped.  Periodic
    flushes would likewise duplicate per actor at concurrency>1.

    Config-file form (the Lua-v2 config shape, src/transforms/lua/v2/
    mod.rs LuaConfig: ``source`` defines functions, ``hooks.process``
    names one or is itself inline source): hooks may be Python SOURCE
    STRINGS — ``source`` is exec'd once and ``hooks.process = "name"``
    resolves against it, or the hook string is inline ``def``/``lambda``
    source.  Hook signatures: init() -> state, process(batch, state)
    -> batch, shutdown(state), timer.hook(state, fire_ts_us) ->
    rows."""
    cfg = dict(cfg)
    hooks = cfg.get("hooks")
    if hooks or isinstance(cfg.get("process"), str):
        ns: dict = {}
        if isinstance(cfg.get("source"), str):
            exec(cfg["source"], ns)  # the Lua-v2 `source` block analog

        def _resolve(spec):
            if not isinstance(spec, str):
                return spec
            if spec in ns:
                return ns[spec]
            s = spec.strip()
            if s.startswith("lambda"):
                return eval(s, ns)
            if s.startswith("def "):
                before = set(ns)
                exec(s, ns)
                new = [k for k in ns if k not in before and callable(ns[k])]
                if len(new) != 1:
                    raise ValueError("inline hook must define exactly one function")
                return ns[new[0]]
            raise ValueError(f"hook {spec!r} is neither a known name nor source")

        merged = dict(hooks or {})
        for k in ("init", "process", "shutdown"):
            if k in cfg and k not in merged:
                merged[k] = cfg[k]
        for k, v in merged.items():
            cfg[k] = _resolve(v)
        if isinstance(cfg.get("timer"), dict) and isinstance(
            cfg["timer"].get("hook"), str
        ):
            cfg["timer"] = {**cfg["timer"], "hook": _resolve(cfg["timer"]["hook"])}
    if "process" in cfg:
        init_fn = cfg.get("init")
        process_fn = cfg["process"]
        shutdown_fn = cfg.get("shutdown")
        timer = cfg.get("timer")
        ts_field = cfg.get("ts_field", "ts")

        def _pad_union(a: "pa.Table", b: "pa.Table") -> "pa.Table":
            import pyarrow as pa

            for name in a.column_names:
                if name not in b.column_names:
                    b = b.append_column(
                        name, pa.nulls(b.num_rows, type=a.schema.field(name).type)
                    )
            for name in b.column_names:
                if name not in a.column_names:
                    a = a.append_column(
                        name, pa.nulls(a.num_rows, type=b.schema.field(name).type)
                    )
            b = b.select(a.column_names)
            return pa.concat_tables([a, b.cast(a.schema)])

        class _HookedUDF:
            def __init__(self):
                self.state = init_fn() if init_fn else None
                self._next_fire = None

            def __call__(self, batch):
                import pyarrow as pa

                out = process_fn(batch, self.state)
                if timer and batch.num_rows:
                    iv = int(timer["interval_ms"]) * 1000
                    ts = batch[ts_field]
                    if isinstance(ts, pa.ChunkedArray):
                        ts = ts.combine_chunks()
                    import pyarrow.compute as pc

                    us = ts.cast(pa.timestamp("us")).cast(pa.int64())
                    lo = pc.min(us).as_py()
                    hi = pc.max(us).as_py()
                    if self._next_fire is None:
                        self._next_fire = (lo // iv) * iv + iv
                    emitted = []
                    while hi >= self._next_fire:
                        rows = timer["hook"](self.state, self._next_fire)
                        emitted.extend(rows or [])
                        self._next_fire += iv
                    if emitted:
                        out = _pad_union(out, pa.Table.from_pylist(emitted))
                return out

            def __del__(self):  # pragma: no cover - interpreter-timing dependent
                if shutdown_fn:
                    shutdown_fn(self.state)

        if timer:
            # Event-time timers need in-order delivery: one ordered
            # partition through one actor (the reference's single-VM
            # constraint; see docstring).
            inputs = inputs.sort(ts_field).repartition(1)
        return inputs.map_batches(
            _HookedUDF,
            batch_format=cfg.get("batch_format", "pyarrow"),
            concurrency=1 if timer else cfg.get("concurrency") or _default_pool(divisor=16),
        )
    fn = cfg["fn"]
    if cfg.get("per_batch", True):
        return inputs.map_batches(fn, batch_format=cfg.get("batch_format", "pyarrow"))
    return fn(inputs)


# ------------------------------------------------------------ compile

class Topology:
    def __init__(self, config: dict):
        self.config = config
        self.nodes: Dict[str, dict] = {}
        for section in ("sources", "transforms", "sinks"):
            for name, cfg in config.get(section, {}).items():
                if name in self.nodes:
                    raise ValueError(f"duplicate component name {name!r}")
                self.nodes[name] = {"section": section, "cfg": cfg}
        self._validate()
        self.datasets: Dict[str, object] = {}

    def _validate(self):
        """DAG checks (graph.rs:242 typecheck analog: inputs exist, no
        cycles, sources have no inputs, sinks have no consumers)."""
        for name, node in self.nodes.items():
            cfg = node["cfg"]
            inputs = cfg.get("inputs", [])
            if node["section"] == "sources" and inputs:
                raise ValueError(f"source {name!r} cannot have inputs")
            if node["section"] != "sources" and not inputs:
                raise ValueError(f"{name!r} needs at least one input")
            for inp in inputs:
                base = inp.split(".")[0]
                if base not in self.nodes:
                    raise ValueError(f"{name!r} references unknown input {base!r}")
                if self.nodes[base]["section"] == "sinks":
                    raise ValueError(f"{name!r} cannot consume from sink {base!r}")
        # cycle detection (DFS)
        WHITE, GRAY, BLACK = 0, 1, 2
        color = {n: WHITE for n in self.nodes}

        def visit(n):
            color[n] = GRAY
            for inp in self.nodes[n]["cfg"].get("inputs", []):
                b = inp.split(".")[0]
                if color[b] == GRAY:
                    raise ValueError(f"cycle through {b!r}")
                if color[b] == WHITE:
                    visit(b)
            color[n] = BLACK

        for n in self.nodes:
            if color[n] == WHITE:
                visit(n)

    def _consumers(self) -> Dict[str, int]:
        out: Dict[str, int] = {}
        for node in self.nodes.values():
            for inp in node["cfg"].get("inputs", []):
                base = inp.split(".")[0]
                out[base] = out.get(base, 0) + 1
        return out

    def _input_ds(self, name: str):
        cfg = self.nodes[name]["cfg"]
        inputs = cfg.get("inputs", [])
        parts = []
        for inp in inputs:
            base, _, port = inp.partition(".")
            built = self._build(base)
            if isinstance(built, dict):
                if port not in built:
                    raise ValueError(f"{base!r} has no output port {port!r} (ports: {list(built)})")
                parts.append(built[port])
            else:
                if port:
                    raise ValueError(f"{base!r} has no named ports")
                parts.append(built)
        if len(parts) == 1:
            return parts[0]
        ds = parts[0]
        for p in parts[1:]:
            ds = ds.union(p)
        return ds

    def _build(self, name: str):
        if name in self.datasets:
            return self.datasets[name]
        node = self.nodes[name]
        cfg = node["cfg"]
        typ = cfg["type"]
        if node["section"] == "sinks" and ("sink_" + typ) in _REGISTRY:
            typ = "sink_" + typ
        builder = _REGISTRY.get(typ)
        if builder is None:
            raise ValueError(f"unknown component type {cfg['type']!r}")
        upstream = self._input_ds(name) if node["section"] != "sources" else None
        ds = builder(cfg, upstream)
        # Fanout clone analog: materialize once when consumed by > 1
        n_consumers = self._consumers().get(name, 0)
        if n_consumers > 1 and not isinstance(ds, dict) and node["section"] != "sinks":
            ds = ds.materialize()
        self.datasets[name] = ds
        return ds

    def build(self) -> Dict[str, object]:
        """Build every sink's Dataset; returns {sink_name: Dataset|dict}."""
        out = {}
        for name, node in self.nodes.items():
            if node["section"] == "sinks":
                out[name] = self._build(name)
        return out


@register("sink_parquet")
def _sink_parquet(cfg, inputs):
    return inputs  # terminal dataset; caller writes via sinks.write_sinks


@register("sink_blackhole")
def _sink_blackhole(cfg, inputs):
    return inputs


@register("sink_csv")
def _sink_csv(cfg, inputs):
    # terminal dataset; sinks.write_sinks(formats={name: "csv"}) writes
    # it with Ray's distributed CSV writer (see __main__.cmd_run)
    return inputs


@register("sink_json")
def _sink_json(cfg, inputs):
    # terminal dataset; written as newline-delimited JSON by write_sinks
    return inputs


@register("sink_console")
def _sink_console(cfg, inputs):
    return inputs


def build(config: dict) -> Dict[str, object]:
    """compile+build: config dict → {sink_name: Dataset} (lazy)."""
    return Topology(config).build()


def to_dot(config: dict) -> str:
    """DOT graph of the topology (`vector graph` analog,
    src/config/dot_graph.rs)."""
    topo = Topology(config)
    lines = ["digraph topology {"]
    shapes = {"sources": "ellipse", "transforms": "box", "sinks": "cds"}
    for name, node in topo.nodes.items():
        lines.append(
            f'  "{name}" [shape={shapes[node["section"]]}, '
            f'label="{name}\\n({node["cfg"]["type"]})"];'
        )
    for name, node in topo.nodes.items():
        for inp in node["cfg"].get("inputs", []):
            base, _, port = inp.partition(".")
            label = f' [label="{port}"]' if port else ""
            lines.append(f'  "{base}" -> "{name}"{label};')
    lines.append("}")
    return "\n".join(lines)
