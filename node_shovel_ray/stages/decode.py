"""Format decoders: shovel's per-message decoder plugins as batch transforms.

Reference contract: every decoder reads ``message.source`` and writes
``message.content`` (src/core/message.js:71-74); here the "source" is a
string/binary column and the "content" is typed output columns. A decode
failure never throws — the row gets ``decode_ok=false`` and an ``error``
column, mirroring the throw→reject contract (src/core/node.js:461-466).

Plugins covered (reference file → function here):

- json     (src/decoders/json.js:10-14)      → :func:`decode_json`
- json5-ish(src/decoders/json5.js:4-9)       → :func:`decode_json` (lenient=True)
- csv      (src/decoders/csv.js:32-52)       → :func:`decode_csv`
- base64   (src/decoders/base64.js:10-14)    → :func:`decode_base64`
- msgpack  (src/decoders/msgpack.js:6-9)     → :func:`decode_msgpack`
  (pure-Python public-spec wire codec, functions/msgpack_codec.py)
- noop     (src/decoders/noop.js:2-6)        → identity / column rename
- multiline(src/decoders/multiline.js:2-17)  → :func:`group_multiline`
- protobuf (src/decoders/protobuf.js:12-141) → :class:`ProtobufDecoder` /
  :class:`ProtobufEncoder`: schema compiled once per actor, pure-Python
  wire codec (functions/proto_codec.py), delimited flat-map + JSON modes.
"""

from __future__ import annotations

import base64
import binascii
import json

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc


def decode_json(
    batch: pa.Table, column: str = "text", out: str = "content", lenient: bool = False
) -> pa.Table:
    """JSON.parse per row → struct-encoded-as-string columns.

    Output: ``{out}`` holds the canonical (sorted-key) JSON re-serialization,
    ``decode_ok`` flags failures. ``lenient=True`` parses full JSON5
    (comments, unquoted keys, single quotes, trailing commas, hex,
    Infinity/NaN — functions/json5.py), matching the reference's json5
    decoder (src/decoders/json5.js:4-9).
    """
    from ..functions.json5 import parse as json5_parse

    loads = json5_parse if lenient else json.loads
    vals, oks = [], []
    for s in batch[column].to_pylist():
        try:
            if s is None:
                raise ValueError("null")
            vals.append(json.dumps(loads(s), sort_keys=True, separators=(",", ":")))
            oks.append(True)
        except (ValueError, TypeError, IndexError):
            vals.append(None)
            oks.append(False)
    return batch.append_column(out, pa.array(vals, pa.string())).append_column(
        "decode_ok", pa.array(oks, pa.bool_())
    )


def json_field(batch: pa.Table, column: str, field: str, out: str) -> pa.Table:
    """Extract one scalar field from a JSON string column (vectorized loop)."""
    vals = []
    for s in batch[column].to_pylist():
        try:
            v = json.loads(s).get(field)
            vals.append(None if v is None else str(v))
        except (ValueError, TypeError, AttributeError):
            vals.append(None)
    return batch.append_column(out, pa.array(vals, pa.string()))


def decode_csv(
    batch: pa.Table,
    column: str = "text",
    columns: list[str] | None = None,
    delimiter: str = ",",
    quote: str = '"',
) -> pa.Table:
    """One CSV line per row → one output column per field.

    Reference semantics (src/decoders/csv.js:32-52): a single record becomes
    the object itself. Unparseable / wrong-arity rows → decode_ok=false.
    """
    import csv as _csv
    import io

    names = columns or []
    cols: dict[str, list] = {n: [] for n in names}
    oks = []
    for s in batch[column].to_pylist():
        try:
            row = next(
                _csv.reader(io.StringIO(s), delimiter=delimiter, quotechar=quote)
            )
            if names and len(row) != len(names):
                raise ValueError("arity")
            if not names:
                names = [f"f{i}" for i in range(len(row))]
                cols = {n: [] for n in names}
            for n, v in zip(names, row):
                cols[n].append(v)
            oks.append(True)
        except (StopIteration, ValueError, _csv.Error, TypeError):
            for n in names:
                cols[n].append(None)
            oks.append(False)
    for n in names:
        batch = batch.append_column(n, pa.array(cols[n], pa.string()))
    return batch.append_column("decode_ok", pa.array(oks, pa.bool_()))


def decode_base64(batch: pa.Table, column: str = "text", out: str = "content") -> pa.Table:
    """base64 → utf-8 string (src/decoders/base64.js:10-14); bad input flagged."""
    vals, oks = [], []
    for s in batch[column].to_pylist():
        try:
            vals.append(base64.b64decode(s, validate=True).decode("utf-8"))
            oks.append(True)
        except (binascii.Error, ValueError, TypeError, UnicodeDecodeError):
            vals.append(None)
            oks.append(False)
    return batch.append_column(out, pa.array(vals, pa.string())).append_column(
        "decode_ok", pa.array(oks, pa.bool_())
    )


def decode_msgpack(batch: pa.Table, column: str = "payload", out: str = "content") -> pa.Table:
    """msgpack bytes → canonical JSON string (src/decoders/msgpack.js:6-9).

    Wire decode is the pure-Python public-spec implementation in
    functions/msgpack_codec.py (no library needed). Binary payloads inside
    the value are rendered as latin-1-escaped strings for the JSON view.
    """
    from ..functions.msgpack_codec import unpackb

    def _jsonable(v):
        if isinstance(v, bytes):
            return v.decode("latin-1")
        if isinstance(v, dict):
            return {k: _jsonable(x) for k, x in v.items()}
        if isinstance(v, (list, tuple)):
            return [_jsonable(x) for x in v]
        return v

    vals, oks = [], []
    for b in batch[column].to_pylist():
        try:
            if b is None:
                raise ValueError("null")
            vals.append(json.dumps(_jsonable(unpackb(b)), sort_keys=True,
                                   separators=(",", ":")))
            oks.append(True)
        except (ValueError, TypeError, UnicodeDecodeError, OverflowError) as e:
            vals.append(None)
            oks.append(False)
    return batch.append_column(out, pa.array(vals, pa.string())).append_column(
        "decode_ok", pa.array(oks, pa.bool_())
    )


def group_multiline(
    batch: pa.Table, column: str = "text", key: str | None = None
) -> pa.Table:
    """Multiline accumulation (src/decoders/multiline.js:2-17): blank line
    flushes one combined record. Batch-local flat-map shape: N input lines →
    M combined rows. At scale, run after a repartition that keeps each
    logical record within one batch (documented partitioning assumption)."""
    lines = batch[column].to_pylist()
    out_rows, stack = [], []
    for ln in lines:
        if ln is None or ln.strip() == "":
            if stack:
                out_rows.append("\n".join(stack))
                stack = []
        else:
            stack.append(ln)
    if stack:
        out_rows.append("\n".join(stack))
    return pa.table({column: pa.array(out_rows, pa.string())})


def split_delimited(
    batch: pa.Table, column: str = "payload", out: str = "record"
) -> pa.Table:
    """Varint length-delimited framing: each binary blob → N record rows
    (flat-map). This is the *real* mechanics of the reference's protobuf
    delimited mode (src/decoders/protobuf.js:111-140, which carries a
    remainder buffer across messages); batch-side there is no remainder —
    a blob is framed completely or its tail is emitted as a truncated-row
    marker (``ok=false``) instead of throwing. Only the per-record body
    decode needs a protobuf runtime (see ProtobufDecoder)."""
    srcs, recs, idxs, oks = [], [], [], []
    for row_i, blob in enumerate(batch[column].to_pylist()):
        if blob is None:
            continue
        pos, rec_i, n = 0, 0, len(blob)
        while pos < n:
            # read varint length
            shift = length = 0
            ok = False
            start = pos
            while pos < n:
                b = blob[pos]
                length |= (b & 0x7F) << shift
                pos += 1
                if not (b & 0x80):
                    ok = True
                    break
                shift += 7
                if shift > 63:
                    break
            if not ok or pos + length > n:
                srcs.append(row_i)
                idxs.append(rec_i)
                recs.append(blob[start:])
                oks.append(False)
                break
            recs.append(blob[pos : pos + length])
            srcs.append(row_i)
            idxs.append(rec_i)
            oks.append(True)
            pos += length
            rec_i += 1
    return pa.table(
        {
            "src_row": pa.array(srcs, pa.int64()),
            "rec_idx": pa.array(idxs, pa.int32()),
            out: pa.array(recs, pa.binary()),
            "ok": pa.array(oks, pa.bool_()),
        }
    )


def write_delimited(records: list[bytes]) -> bytes:
    """Inverse framing (the encoder's delimited concat,
    src/encoders/protobuf.js:54-68)."""
    out = bytearray()
    for r in records:
        n = len(r)
        while True:
            b = n & 0x7F
            n >>= 7
            out.append(b | (0x80 if n else 0))
            if not n:
                break
        out += r
    return bytes(out)


class ProtobufDecoder:
    """Actor-pool protobuf decoder (src/decoders/protobuf.js:12-141).

    Stateful __init__ compiles the .proto schema once per actor (the
    reference's onStart root.load); __call__ decodes each payload with the
    pure-Python wire codec (functions/proto_codec.py). ``delimited=True``
    flat-maps varint-length-delimited buffers into one row per record
    (decodeDelimited, src/decoders/protobuf.js:111-140);
    ``content_type="application/json"`` accepts JSON payloads like the
    reference's fromObject path. Output: ``content`` = canonical JSON,
    ``proto_class`` header column, ``decode_ok`` flag.
    """

    def __init__(
        self,
        proto_schema: str,
        class_name: str,
        delimited: bool = False,
        content_type: str = "application/protobuf",
        column: str = "payload",
        out: str = "content",
    ):
        from ..functions.proto_codec import parse_proto

        self.schema = parse_proto(proto_schema)
        self.schema.lookup(class_name)  # fail fast, like onStart
        self.class_name = class_name
        self.delimited = delimited
        self.content_type = content_type
        self.column = column
        self.out = out

    def _decode_one(self, raw: bytes) -> str:
        from ..functions.proto_codec import decode_message

        if self.content_type in ("text/json", "application/json"):
            obj = json.loads(raw)
        else:
            obj = decode_message(self.schema, self.class_name, raw)
        return json.dumps(obj, sort_keys=True, separators=(",", ":"))

    def __call__(self, batch: pa.Table) -> pa.Table:
        if self.delimited:
            framed = split_delimited(batch, column=self.column, out="_rec")
            payloads = framed["_rec"].to_pylist()
            frame_ok = framed["ok"].to_pylist()
            base = {
                "src_row": framed["src_row"],
                "rec_idx": framed["rec_idx"],
            }
        else:
            payloads = batch[self.column].to_pylist()
            frame_ok = [True] * len(payloads)
            base = {
                c: batch[c] for c in batch.column_names if c != self.column
            }
        vals, oks = [], []
        for raw, fok in zip(payloads, frame_ok):
            try:
                if raw is None or not fok:
                    raise ValueError("bad frame")
                vals.append(self._decode_one(raw))
                oks.append(True)
            except Exception:
                vals.append(None)
                oks.append(False)
        return pa.table(
            {
                **base,
                self.out: pa.array(vals, pa.string()),
                "proto_class": pa.array([self.class_name] * len(vals), pa.string()),
                "decode_ok": pa.array(oks, pa.bool_()),
            }
        )


class ProtobufEncoder:
    """Actor-pool protobuf encoder (src/encoders/protobuf.js:54-68): one
    JSON-object content row → wire bytes; ``delimited=True`` prefixes each
    record with its varint length (encodeDelimited concat)."""

    def __init__(
        self,
        proto_schema: str,
        class_name: str,
        delimited: bool = False,
        column: str = "content",
        out: str = "payload",
    ):
        from ..functions.proto_codec import parse_proto

        self.schema = parse_proto(proto_schema)
        self.schema.lookup(class_name)
        self.class_name = class_name
        self.delimited = delimited
        self.column = column
        self.out = out

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ..functions.proto_codec import encode_message

        vals = []
        for s in batch[self.column].to_pylist():
            obj = json.loads(s) if isinstance(s, (str, bytes)) else s
            body = encode_message(self.schema, self.class_name, obj)
            vals.append(write_delimited([body]) if self.delimited else body)
        return batch.append_column(self.out, pa.array(vals, pa.binary()))
