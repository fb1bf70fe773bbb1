"""Driver contract for the graft builder (Ray Data target).

The driver calls ``ray.init`` itself before importing this module; nothing
here (or in node_shovel_ray) calls ``ray.init``/``ray.shutdown``.

``queries()``/``oracle_sql()`` pairs: the flagship transcript DAG runs over a
deterministic "transcriptify" view of the ``events`` table (see
node_shovel_ray/stages/transcriptify.py and pipelines/sql_oracle.py) so every
stage is oracle-checkable against the driver's pre-registered DuckDB views.
"""

from __future__ import annotations

import os
from collections.abc import Callable
from typing import Any

import pyarrow as pa

import ray.data as rd

from node_shovel_ray.pipelines import flagship, sql_oracle as Q
from node_shovel_ray.stages.parse import parse
from node_shovel_ray.stages.transcriptify import transcriptify


def _events(sf_dir: str) -> "rd.Dataset":
    return rd.read_parquet(os.path.join(sf_dir, "events.parquet"))


def _transcripts(sf_dir: str) -> "rd.Dataset":
    return transcriptify(_events(sf_dir))


def _parsed(sf_dir: str) -> "rd.Dataset":
    return parse(_transcripts(sf_dir))


def _routed(sf_dir: str) -> "rd.Dataset":
    ev = _events(sf_dir)
    meta = flagship.build_conv_meta_from_events(ev)
    return flagship.enrich_route(parse(transcriptify(ev)), meta)


def entry() -> Any:
    """Flagship pipeline on /root/testdata/sf0.001: full DAG → sink counts."""
    ev = _events("/root/testdata/sf0.001")
    res = flagship.from_events(ev)
    return res["counts"]


def queries() -> dict[str, Callable[[str], Any]]:
    def q_transcripts(sf_dir: str):
        return _transcripts(sf_dir)

    def q_parse(sf_dir: str):
        return _parsed(sf_dir)

    def q_conv_meta(sf_dir: str):
        return flagship.build_conv_meta_from_events(_events(sf_dir))

    def q_enrich(sf_dir: str):
        return _routed(sf_dir).select_columns(
            ["conv_id", "turn_idx", "tenant", "channel", "priority",
             "seq_in_conv", "hour", "sink_tag", "audit"]
        )

    def _sink(sf_dir: str, tag: str):
        from node_shovel_ray.stages.route import branch

        return branch(_routed(sf_dir), tag).select_columns(
            ["conv_id", "turn_idx", "role", "text", "sink_tag"]
        )

    def q_audit(sf_dir: str):
        from node_shovel_ray.stages.route import broadcast_branch

        return broadcast_branch(_routed(sf_dir)).select_columns(
            ["conv_id", "turn_idx", "role", "text", "priority"]
        )

    def q_sink_counts(sf_dir: str):
        from node_shovel_ray.stages.aggregate import sink_counts

        return sink_counts(_routed(sf_dir))

    return {
        "transcriptify": q_transcripts,
        "parse": q_parse,
        "conv_meta": q_conv_meta,
        "enrich": q_enrich,
        "sink_errors": lambda d: _sink(d, "errors"),
        "sink_tools": lambda d: _sink(d, "tools"),
        "sink_chat": lambda d: _sink(d, "chat"),
        "sink_audit": q_audit,
        "sink_counts": q_sink_counts,
    }


def oracle_sql() -> dict[str, str]:
    return {
        "transcriptify": Q.Q_TRANSCRIPTS,
        "parse": Q.Q_PARSE,
        "conv_meta": Q.Q_CONV_META,
        "enrich": Q.Q_ENRICH,
        "sink_errors": Q.sink_sql("errors"),
        "sink_tools": Q.sink_sql("tools"),
        "sink_chat": Q.sink_sql("chat"),
        "sink_audit": Q.Q_AUDIT,
        "sink_counts": Q.Q_SINK_COUNTS,
    }
