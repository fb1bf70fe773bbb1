"""YAML pipeline configuration — the user-facing surface of the engine.

Mirrors shovel's pipeline YAML (reference: src/core/pipeline_config.js:68-90)
— sections ``input / decoder / pipeline / encoder / output``, each selecting
a plugin by ``use:`` with an ``options:`` mapping — compiled into a lazy
``ray.data.Dataset`` plan instead of an event-driven process chain
(src/core/processor.js:79-84). Also reproduces:

- ``${NAME}`` / ``${NAME:default}`` env-var interpolation anywhere in the
  YAML (src/core/pipeline_config.js:42-54)
- the plugin registry + user-extension idiom (``use:`` resolved from
  built-ins or registered callables — src/core/utils.js:14-43): register
  custom stages with :func:`register`.

A stage factory takes the ``options`` dict and returns a callable
``Dataset -> Dataset`` (sources return ``() -> Dataset``; sinks return
``Dataset -> result``).
"""

from __future__ import annotations

import os
import re
from collections.abc import Callable
from dataclasses import dataclass, field

import ray.data as rd

_ENV_RE = re.compile(r"\$\{([A-Za-z_][A-Za-z0-9_]*)(?::([^}]*))?\}")


def interpolate_env(text: str) -> str:
    """``${NAME}`` → env value (error if unset), ``${NAME:default}`` → value
    or default — reference semantics (pipeline_config.js:42-54)."""

    def sub(m: re.Match) -> str:
        name, default = m.group(1), m.group(2)
        val = os.environ.get(name)
        if val is None:
            if default is None:
                raise KeyError(f"environment variable {name} is not set and has no default")
            return default
        return val

    return _ENV_RE.sub(sub, text)


# --------------------------------------------------------------- registry

REGISTRY: dict[str, dict[str, Callable]] = {
    "input": {}, "decoder": {}, "pipeline": {}, "encoder": {}, "output": {},
}


def register(kind: str, name: str):
    """Decorator: register a stage factory (the `use:` extension surface)."""

    def deco(factory: Callable) -> Callable:
        REGISTRY[kind][name] = factory
        return factory

    return deco


def _noop_factory(options):
    return lambda ds: ds


for _kind in ("decoder", "pipeline", "encoder"):
    REGISTRY[_kind]["noop"] = _noop_factory


# inputs -------------------------------------------------------------------


@register("input", "parquet")
def _in_parquet(o):
    return lambda: rd.read_parquet(o["path"], columns=o.get("columns"))


@register("input", "json")
def _in_json(o):
    return lambda: rd.read_json(o["path"])


@register("input", "csv")
def _in_csv(o):
    return lambda: rd.read_csv(o["path"])


@register("input", "text")
def _in_text(o):
    # file input analogue: line per record (reference: src/inputs/file.js)
    return lambda: rd.read_text(o["path"])


@register("input", "multiline_text")
def _in_multiline(o):
    # multiline records assembled correctly across EVERY file boundary
    # (reference src/decoders/multiline.js stack-carry; sources/multiline.py)
    from ..sources.multiline import read_multiline_text

    return lambda: read_multiline_text(o["path"], column=o.get("column", "text"))


@register("input", "stream")
def _in_stream(o):
    # chunked binary stream analogue (reference src/inputs/stream.js:7-96):
    # start_position beginning/end/<int>, buffer_size-byte chunks
    from ..sources.stream import read_binary_stream

    return lambda: read_binary_stream(
        o["path"],
        start_position=o.get("start_position", "beginning"),
        buffer_size=int(o.get("buffer_size", 100_000)),
    )


@register("input", "items")
def _in_items(o):
    return lambda: rd.from_items(o["items"])


@register("input", "tail")
def _in_tail(o):
    # file `follow: true` analogue (reference src/inputs/file.js:113-126):
    # each pipeline run is one tail TICK — only lines appended since the
    # committed offset flow in; whole-line guarantee, rotation reset.
    # `state_dir` holds the offset manifest (sources/tail.py).
    from ..sources.tail import (
        commit_offsets,
        consumed_offsets,
        discover_appended,
        load_offsets,
        tail_dataset,
    )

    tick: dict = {"ranges": []}

    def make():
        tick["ranges"] = discover_appended(
            o["path"], o["state_dir"], pattern=o.get("pattern", "*.log")
        )
        return tail_dataset(
            tick["ranges"], max_chunk=int(o.get("max_chunk", 64 << 20))
        )

    def commit():
        # called by build().run() AFTER the sink succeeds — crash before
        # this re-reads the same ranges next run (at-least-once; pair with
        # ResumableRunner output partitions for exactly-once)
        state = load_offsets(o["state_dir"])
        state.update(consumed_offsets(tick["ranges"]))
        commit_offsets(o["state_dir"], state)

    make.commit = commit
    return make


@register("input", "spool")
def _in_spool(o):
    # drain tick over a network-collector spool (sources/net.py) — the
    # batch analogue of the reference's live tcp/udp/http-server inputs
    # (src/inputs/tcp.js, udp.js, http-server.js): collectors seal shards;
    # each run consumes the sealed backlog and commits it only AFTER the
    # sink succeeds (same at-least-once contract as input: tail).
    from ..sources.net import commit_spool, drain_spool

    tick: dict = {"shards": []}

    def make():
        ds, shards = drain_spool(o["spool_dir"])
        tick["shards"] = shards
        return ds if ds is not None else rd.from_items([{"source": ""}]).limit(0)

    def commit():
        if tick["shards"]:
            commit_spool(o["spool_dir"], tick["shards"])

    make.commit = commit
    return make


# decoders -----------------------------------------------------------------


@register("decoder", "json")
def _dec_json(o):
    from ..stages.decode import decode_json

    col = o.get("column", "text")
    return lambda ds: ds.map_batches(
        lambda t: decode_json(t, column=col, lenient=o.get("lenient", False)),
        batch_format="pyarrow",
    )


@register("decoder", "json5")
def _dec_json5(o):
    return _dec_json({**o, "lenient": True})


@register("decoder", "csv")
def _dec_csv(o):
    from ..stages.decode import decode_csv

    return lambda ds: ds.map_batches(
        lambda t: decode_csv(
            t,
            column=o.get("column", "text"),
            columns=o.get("columns"),
            delimiter=o.get("delimiter", ","),
        ),
        batch_format="pyarrow",
    )


@register("decoder", "base64")
def _dec_b64(o):
    from ..stages.decode import decode_base64

    return lambda ds: ds.map_batches(
        lambda t: decode_base64(t, column=o.get("column", "text")),
        batch_format="pyarrow",
    )


@register("decoder", "msgpack")
def _dec_msgpack(o):
    from ..stages.decode import decode_msgpack

    return lambda ds: ds.map_batches(
        lambda t: decode_msgpack(t, column=o.get("column", "payload")),
        batch_format="pyarrow",
    )


def _proto_class_name(o) -> str:
    """class_name config, falling back to the content-type 'proto' parameter
    — the reference's getClassName (src/decoders/protobuf.js:73-79)."""
    if o.get("class_name"):
        return o["class_name"]
    from ..functions.template import parse_content_type

    ct = parse_content_type(o.get("content_type", ""))
    name = ct["parameters"].get("proto")
    if not name:
        raise ValueError("Missing class name")
    return name


@register("decoder", "protobuf")
def _dec_protobuf(o):
    from ..stages.decode import ProtobufDecoder
    from ..stages.keyed import default_pool

    schema = o.get("proto_schema") or _read_proto(o)
    return lambda ds: ds.map_batches(
        ProtobufDecoder,
        fn_constructor_kwargs=dict(
            proto_schema=schema,
            class_name=_proto_class_name(o),
            delimited=o.get("delimited", False),
            content_type=o.get("content_type", "application/protobuf"),
            column=o.get("column", "payload"),
        ),
        batch_format="pyarrow",
        concurrency=default_pool(),
    )


@register("encoder", "protobuf")
def _enc_protobuf(o):
    from ..stages.decode import ProtobufEncoder
    from ..stages.keyed import default_pool

    schema = o.get("proto_schema") or _read_proto(o)
    return lambda ds: ds.map_batches(
        ProtobufEncoder,
        fn_constructor_kwargs=dict(
            proto_schema=schema,
            class_name=_proto_class_name(o),
            delimited=o.get("delimited", False),
            column=o.get("column", "content"),
        ),
        batch_format="pyarrow",
        concurrency=default_pool(),
    )


def _read_proto(o) -> str:
    """root_path + proto_path file loading, as the reference's onStart does
    (src/decoders/protobuf.js:49-63); multiple files concatenate."""
    import os

    root = o.get("root_path")
    if not root:
        raise ValueError('Configuration "root_path" must be defined')
    paths = o.get("proto_path") or []
    if isinstance(paths, str):
        paths = [paths]
    return "\n".join(
        open(os.path.join(root, p), encoding="utf-8").read() for p in paths
    )


@register("decoder", "transcriptify")
def _dec_transcriptify(o):
    from ..stages.transcriptify import transcriptify

    return transcriptify


@register("decoder", "syslog")
def _dec_syslog(o):
    from ..stages.parse import parse_syslog_batch

    col = o.get("column", "text")
    return lambda ds: ds.map_batches(
        lambda t: parse_syslog_batch(t, column=col), batch_format="pyarrow"
    )


@register("decoder", "multiline")
def _dec_multiline(o):
    from ..stages.decode import group_multiline

    col = o.get("column", "text")
    return lambda ds: ds.map_batches(
        lambda t: group_multiline(t, column=col), batch_format="pyarrow",
        batch_size=None,
    )


# pipeline (UDF) stages ----------------------------------------------------


@register("pipeline", "parse")
def _pl_parse(o):
    from ..stages.parse import parse

    return lambda ds: parse(ds, batch_size=o.get("batch_size", 32768))


@register("pipeline", "enrich")
def _pl_enrich(o):
    import pyarrow.parquet as pq

    from ..stages.enrich import lookup_enrich, seq_number

    def fn(ds):
        if "lookup_path" in o:
            lookup = pq.read_table(o["lookup_path"])
            ds = lookup_enrich(ds, lookup, key=o.get("key", "conv_id"))
        if o.get("seq_number", True):
            ds = seq_number(
                ds,
                key=o.get("key", "conv_id"),
                order_col=o.get("order_col", "turn_idx"),
            )
        return ds

    return fn


@register("pipeline", "route")
def _pl_route(o):
    from ..stages.route import route

    return route


@register("pipeline", "filter")
def _pl_filter(o):
    import pyarrow.compute as pc

    col, op, val = o["column"], o.get("op", "=="), o["value"]
    ops = {
        "==": pc.equal, "!=": pc.not_equal, "<": pc.less, "<=": pc.less_equal,
        ">": pc.greater, ">=": pc.greater_equal,
    }
    kernel = ops[op]
    return lambda ds: ds.map_batches(
        lambda t: t.filter(kernel(t[col], val)), batch_format="pyarrow"
    )


@register("pipeline", "chain")
def _pl_chain(o):
    """Compose several pipeline stages in order:
    ``use: chain, options: {stages: [{use: normalize}, {use: sample, ...}]}``
    — the YAML analogue of a multi-node shovel pipeline body."""
    subs = [_resolve("pipeline", s) for s in o.get("stages", [])]

    def fn(ds):
        for s in subs:
            ds = s(ds)
        return ds

    return fn


@register("pipeline", "normalize")
def _pl_normalize(o):
    """Text normalization stage (NFC → lower → collapse ws → trim)."""
    from ..functions.textstats import normalize_text

    col = o.get("column", "text")
    out = o.get("out", "text_norm")
    return lambda ds: ds.map_batches(
        lambda t: normalize_text(t, column=col, out=out),
        batch_format="pyarrow", zero_copy_batch=True,
    )


@register("pipeline", "sample")
def _pl_sample(o):
    """Deterministic sampling: ``fraction: 0.1`` (hash cutoff) or
    ``per_group: {group: lang, k: 10}`` (hash-rank reservoir)."""
    from ..functions.sampling import sample_fraction, sample_per_group

    id_col = o.get("id_col", "doc_id")
    if "fraction" in o:
        p = float(o["fraction"])
        return lambda ds: sample_fraction(ds, p, id_col=id_col)
    if "per_group" in o:
        pg = o["per_group"]
        return lambda ds: sample_per_group(
            ds, group_col=pg["group"], k=int(pg["k"]), id_col=id_col
        )
    # exact-size global sample (top-n by md5 rank)
    from ..functions.sampling import sample_topn

    return lambda ds: sample_topn(ds, n=int(o["top_n"]), id_col=id_col)


@register("pipeline", "pack")
def _pl_pack(o):
    """Sequence packing: global token offsets + training-window ids."""
    from ..functions.packing import pack_docs

    return lambda ds: pack_docs(
        ds,
        budget=int(o["budget"]),
        id_col=o.get("id_col", "doc_id"),
        token_col=o.get("token_col", "n_tokens"),
    )


@register("pipeline", "dedup")
def _pl_dedup(o):
    """Exact dedup: keep the min-id row per identical key value."""
    from ..functions.dedup import dedup_exact

    return lambda ds: dedup_exact(
        ds, key_col=o.get("key", "text"), id_col=o.get("id_col", "doc_id")
    )


@register("pipeline", "cluster")
def _pl_cluster(o):
    """Embedding k-means clustering: (id, cluster, sim) per vector."""
    from ..functions.similarity import kmeans_assign_det

    return lambda ds: kmeans_assign_det(
        ds,
        n_clusters=int(o.get("n_clusters", 16)),
        id_col=o.get("id_col", "vec_id"),
        vec_col=o.get("vec_col", "embedding"),
    )


@register("pipeline", "semdedup")
def _pl_semdedup(o):
    """SemDeDup semantic dedup: cluster then prune within-cluster
    near-dups (cosine ≥ tau, keep the smallest id)."""
    from ..functions.similarity import semdedup

    return lambda ds: semdedup(
        ds,
        n_clusters=int(o.get("n_clusters", 16)),
        tau=float(o.get("tau", 0.35)),
        id_col=o.get("id_col", "vec_id"),
        vec_col=o.get("vec_col", "embedding"),
    )


@register("pipeline", "shuffle")
def _pl_shuffle(o):
    """Deterministic seeded corpus shuffle → (id, shuffle_rank)."""
    from ..functions.shuffle import deterministic_shuffle

    return lambda ds: deterministic_shuffle(
        ds, id_col=o.get("id_col", "doc_id"), seed=str(o.get("seed", "shuf42"))
    )


@register("pipeline", "textstats")
def _pl_textstats(o):
    """Per-doc text signals: which = tokens | quality | langid | pii."""
    from ..functions import textstats as T

    fns = {
        "tokens": T.token_count,
        "quality": T.quality_score,
        "langid": T.lang_id,
        "pii": T.pii_stats,
    }
    which = o.get("which", "tokens")
    if which not in fns:
        raise ValueError(f"textstats 'which' must be one of {sorted(fns)}")
    fn = fns[which]
    col = o.get("column", "text")
    return lambda ds: ds.map_batches(
        lambda t: fn(t, column=col), batch_format="pyarrow"
    )


@register("pipeline", "decontaminate")
def _pl_decontaminate(o):
    """Drop rows whose NORMALIZED text matches a blocklist parquet column
    (broadcast anti filter — corpus streams, blocklist ships once)."""
    import pyarrow as pa
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    from ..functions.textstats import normalize_text

    col = o.get("column", "text")
    bcol = o.get("block_column", col)

    def fn(ds):
        bt = pq.read_table(o["path"], columns=[bcol])
        bt = normalize_text(bt, column=bcol, out="_bn")
        block = pa.array(
            sorted({v for v in bt["_bn"].to_pylist() if v is not None}),
            pa.string(),
        )

        def anti(t: pa.Table) -> pa.Table:
            t2 = normalize_text(t, column=col, out="_tn")
            hit = pc.fill_null(pc.is_in(t2["_tn"], value_set=block), False)
            return t.filter(pc.invert(hit))

        return ds.map_batches(anti, batch_format="pyarrow")

    return fn


@register("pipeline", "join")
def _pl_join(o):
    """Distributed hash join against another table (parquet path)."""
    import ray.data as _rd

    from ..stages.join import hash_join

    def fn(ds):
        right = _rd.read_parquet(o["path"], columns=o.get("columns"))
        return hash_join(
            ds,
            right,
            left_on=o["left_on"],
            right_on=o.get("right_on"),
            how=o.get("how", "inner"),
        )

    return fn


@register("pipeline", "window")
def _pl_window(o):
    """Tumbling-window aggregate; ``size`` accepts Duration strings
    ('1h', '30m', '90s' — functions/template.parse_duration)."""
    from ..functions.template import parse_duration_s
    from ..stages.window import tumbling_aggregate

    size_raw = parse_duration_s(o.get("size", "1h"))
    size_s = int(size_raw)
    if size_s < 1 or size_s != size_raw:
        # sub-second / fractional-second sizes would silently truncate
        # (and 0 would floor-divide every row into the epoch-0 window)
        raise ValueError(
            f"window size must be a whole number of seconds >= 1s, got {o.get('size')!r}"
        )
    keys = o.get("keys", [])
    return lambda ds: tumbling_aggregate(
        ds, keys=keys, ts_col=o.get("ts_col", "ts"), size_s=size_s,
        value_col=o.get("value_col"),
    )


# encoders -----------------------------------------------------------------


@register("encoder", "json")
def _enc_json(o):
    from ..stages.encode import encode_json

    return lambda ds: ds.map_batches(
        lambda t: encode_json(t, columns=o.get("columns"), pretty=o.get("pretty", False)),
        batch_format="pyarrow",
    )


@register("encoder", "csv")
def _enc_csv(o):
    from ..stages.encode import encode_csv

    return lambda ds: ds.map_batches(
        lambda t: encode_csv(t, columns=o.get("columns")), batch_format="pyarrow"
    )


@register("encoder", "msgpack")
def _enc_msgpack(o):
    from ..stages.encode import encode_msgpack

    return lambda ds: ds.map_batches(
        lambda t: encode_msgpack(t, columns=o.get("columns")),
        batch_format="pyarrow",
    )


@register("encoder", "format")
def _enc_format(o):
    from ..stages.encode import encode_format

    return lambda ds: ds.map_batches(
        lambda t: encode_format(t, o["template"], ts_col=o.get("ts_col", "ts")),
        batch_format="pyarrow",
    )


@register("encoder", "base64")
def _enc_b64(o):
    from ..stages.encode import encode_base64

    return lambda ds: ds.map_batches(
        lambda t: encode_base64(t, o.get("column", "payload")), batch_format="pyarrow"
    )


# outputs ------------------------------------------------------------------

# sink names that fully CONSUME the dataset when called (write_* / count):
# only these may auto-commit a stateful source's offsets afterwards; lazy
# sinks ("dataset" returns an unexecuted plan, "stdout" reads only `limit`
# rows) must materialize first or the at-least-once contract breaks —
# offsets would advance past bytes nothing has processed yet
EAGER_OUTPUTS = frozenset(
    {"parquet", "json", "csv", "jsonl", "partitioned_parquet", "blackhole",
     "tcp", "udp", "mqtt", "amqp"}
)


@register("output", "parquet")
def _out_parquet(o):
    return lambda ds: (ds.write_parquet(o["path"]), o["path"])[1]


@register("output", "json")
def _out_json(o):
    return lambda ds: (ds.write_json(o["path"]), o["path"])[1]


@register("output", "csv")
def _out_csv(o):
    return lambda ds: (ds.write_csv(o["path"]), o["path"])[1]


@register("output", "stdout")
def _out_stdout(o):
    # debug sink (reference: src/outputs/stdout.js, debug.js)
    def fn(ds):
        for row in ds.take(o.get("limit", 20)):
            print(row)
        return None

    return fn


@register("output", "blackhole")
def _out_blackhole(o):
    # consume-and-discard benchmark sink (reference: src/outputs/blackhole.js)
    return lambda ds: ds.count()


@register("output", "jsonl")
def _out_jsonl(o):
    from ..sources.jsonl import write_jsonl

    return lambda ds: (write_jsonl(ds, o["path"], columns=o.get("columns")),
                       o["path"])[1]


@register("output", "partitioned_parquet")
def _out_partitioned(o):
    # templated time-partitioned routing — the ES index-template analogue
    from ..stages.encode import write_time_partitioned

    return lambda ds: write_time_partitioned(
        ds,
        o["path"],
        ts_col=o.get("ts_col", "ts"),
        granularity=o.get("granularity", "day"),
        partition_template=o.get("template"),
    )


@register("output", "tcp")
def _out_tcp(o):
    # persistent-connection newline-framed TCP sink (reference
    # src/outputs/tcp.js:6-96); returns rows delivered (the ack ledger)
    from ..stages.sink_net import write_tcp

    return lambda ds: write_tcp(
        ds,
        o.get("host", "127.0.0.1"),
        int(o.get("port", 515)),
        column=o.get("column", "payload"),
        encoding=o.get("encoding", "utf-8"),
    )


@register("output", "udp")
def _out_udp(o):
    # one-datagram-per-row UDP sink (reference src/outputs/udp.js:4-42)
    from ..stages.sink_net import write_udp

    return lambda ds: write_udp(
        ds,
        o.get("host", "127.0.0.1"),
        int(o.get("port", 515)),
        column=o.get("column", "payload"),
        encoding=o.get("encoding", "utf-8"),
    )


@register("output", "mqtt")
def _out_mqtt(o):
    # qos-1 publisher with per-row templated topic (reference
    # src/outputs/mqtt.js:111-129); returns rows delivered
    from ..stages.sink_net import write_mqtt

    return lambda ds: write_mqtt(
        ds,
        o.get("host", "127.0.0.1"),
        int(o.get("port", 1883)),
        topic=o.get("topic", "nsr"),
        column=o.get("column", "payload"),
        qos=int(o.get("qos", 1)),
        username=o.get("username"),
        password=o.get("password"),
    )


@register("output", "amqp")
def _out_amqp(o):
    # exchange publisher with per-row templated routing key (reference
    # src/outputs/amqp.js:60-86); returns rows delivered
    from ..stages.sink_net import write_amqp

    return lambda ds: write_amqp(
        ds,
        o.get("host", "127.0.0.1"),
        int(o.get("port", 5672)),
        exchange=o.get("exchange_name", ""),
        routing_key=o.get("routing_key", ""),
        column=o.get("column", "payload"),
        exchange_type=o.get("exchange_type", "direct"),
        username=o.get("username", "guest"),
        password=o.get("password", "guest"),
    )


@register("output", "dataset")
def _out_dataset(o):
    return lambda ds: ds


# --------------------------------------------------------------- pipeline


@dataclass
class PipelineConfig:
    name: str
    input: dict
    decoder: dict = field(default_factory=lambda: {"use": "noop"})
    pipeline: dict = field(default_factory=lambda: {"use": "noop"})
    encoder: dict = field(default_factory=lambda: {"use": "noop"})
    output: dict = field(default_factory=lambda: {"use": "dataset"})
    # multi-output fan-out (reference: src/outputs/pipeline.js:4-30):
    # outputs + mode broadcast (every sink gets all rows) | fanout
    # (rows round-robin split across sinks, src/core/master.js:214-224)
    outputs: list[dict] | None = None
    mode: str = "broadcast"

    @classmethod
    def from_yaml(cls, path: str) -> "PipelineConfig":
        import yaml

        with open(path) as fh:
            raw = fh.read()
        return cls.from_dict(yaml.safe_load(interpolate_env(raw)))

    @classmethod
    def from_dict(cls, d: dict) -> "PipelineConfig":
        return cls(
            name=d.get("name", "pipeline"),
            input=d["input"],
            decoder=d.get("decoder", {"use": "noop"}),
            pipeline=d.get("pipeline", {"use": "noop"}),
            encoder=d.get("encoder", {"use": "noop"}),
            output=d.get("output", {"use": "dataset"}),
            outputs=d.get("outputs"),
            mode=d.get("mode", "broadcast"),
        )


def _resolve(kind: str, section: dict) -> Callable:
    if not isinstance(section, dict):
        raise TypeError(
            f"{kind} section must be a mapping with a 'use:' key, got "
            f"{type(section).__name__}: {section!r}"
        )
    use = section.get("use", "noop")
    try:
        factory = REGISTRY[kind][use]
    except KeyError:
        raise KeyError(f"no {kind} plugin named {use!r}; registered: "
                       f"{sorted(REGISTRY[kind])}") from None
    return factory(section.get("options", {}) or {})


def build(cfg: PipelineConfig, capture: dict | None = None):
    """Compile the six-stage chain into one lazy callable; run() executes.

    Stage order mirrors processor.load() wiring
    (input→decoder→pipeline→encoder→output, src/core/processor.js:79-84);
    the queue stage has no analogue — Ray Data's streaming executor provides
    the buffering/backpressure it existed for (SURVEY.md §4.2).

    ``capture``, if given, receives ``{"dataset": <final pre-sink Dataset>}``
    so callers can read ``dataset.stats()`` after execution (the CLI's
    per-operator metrics dump — reference aggregated-metrics UX).
    """
    source = _resolve("input", cfg.input)
    stages = [
        _resolve("decoder", cfg.decoder),
        _resolve("pipeline", cfg.pipeline),
        _resolve("encoder", cfg.encoder),
    ]
    multi = [_resolve("output", o) for o in cfg.outputs] if cfg.outputs else None
    sink = _resolve("output", cfg.output) if not multi else None

    def run():
        ds = source()
        for stage in stages:
            ds = stage(ds)
        if capture is not None:
            capture["dataset"] = ds
        if multi is None:
            # sources with progress state (input: tail) commit offsets only
            # AFTER the bytes were actually processed. Eager sinks consume
            # the dataset themselves; a lazy sink (dataset/stdout) would let
            # commit() run on an unexecuted plan, so force execution first.
            stateful = hasattr(source, "commit")
            if stateful and cfg.output.get("use", "dataset") not in EAGER_OUTPUTS:
                ds = ds.materialize()
            out = sink(ds)
            if stateful:
                source.commit()
            return out
        # multi-output: materialize once so sinks don't recompute upstream
        # (SURVEY.md §7.5 fan-out-without-recompute)
        if cfg.mode == "fanout":
            # per-row content-hash assignment: complete (no rows dropped —
            # Dataset.split(equal=True) drops the remainder) and fair
            # independent of block layout; shovel fanout is round-robin
            # delivery of every message (master.js:214-224)
            import hashlib

            import numpy as np
            import pyarrow as pa_

            n = len(multi)

            def tag(t: pa_.Table) -> pa_.Table:
                # round-robin within the block (exact fairness even under
                # key skew), block offset derived from content so multiple
                # small blocks don't all start at sink 0
                if len(t) == 0:
                    start = 0
                else:
                    first = str(t.column(0)[0].as_py())
                    start = int(
                        hashlib.sha1(f"{first}-{len(t)}".encode()).hexdigest()[:8],
                        16,
                    ) % n
                fan = (np.arange(len(t), dtype=np.int64) + start) % n
                return t.append_column("_fan", pa_.array(fan))

            tagged = ds.map_batches(tag, batch_format="pyarrow").materialize()
            outs = []
            for i, s in enumerate(multi):
                part = tagged.map_batches(
                    lambda t, i=i: t.filter(
                        pa_.compute.equal(t["_fan"], i)
                    ).drop(["_fan"]),
                    batch_format="pyarrow",
                )
                outs.append(s(part))
            if hasattr(source, "commit"):
                source.commit()
            return outs
        mat = ds.materialize()
        outs = [s(mat) for s in multi]
        if hasattr(source, "commit"):
            source.commit()
        return outs

    return run
