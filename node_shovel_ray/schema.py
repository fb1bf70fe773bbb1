"""Arrow schemas for every stage boundary.

The reference is schema-free (message ``content`` is whatever the decoder
produced, reference: src/core/message.js:51-64); the rebuild fixes a
``pyarrow.Schema`` at every stage boundary so parse failures become routed
rows instead of thrown exceptions (reference throw→reject contract:
src/core/node.js:461-466).
"""

from __future__ import annotations

import pyarrow as pa

# Primary input (BASELINE.json input_hint / FIXTURES.md §1).
TRANSCRIPTS = pa.schema(
    [
        ("conv_id", pa.string()),
        ("turn_idx", pa.int32()),
        ("role", pa.string()),
        ("text", pa.string()),
        ("tool", pa.string()),
        ("ts", pa.timestamp("us")),
    ]
)

# Enrich-side lookup, one row per conv_id (FIXTURES.md §2).
CONV_META = pa.schema(
    [
        ("conv_id", pa.string()),
        ("tenant", pa.string()),
        ("channel", pa.string()),
        ("priority", pa.int32()),
    ]
)

# Parse-stage output = TRANSCRIPTS + extracted columns (FIXTURES.md §3).
PARSED_EXTRA = [
    ("parsed_tool", pa.string()),   # null when no tool invocation in text
    ("error_code", pa.string()),    # null when no ERR-#### token
    ("role_tag", pa.string()),      # null when no [role=...] prefix
    ("parse_ok", pa.bool_()),
]
PARSED = pa.schema(list(TRANSCRIPTS) + [pa.field(n, t) for n, t in PARSED_EXTRA])

# After enrich: lookup columns + sequence number + hour bucket + sink tag.
ENRICHED_EXTRA = [
    ("tenant", pa.string()),
    ("channel", pa.string()),
    ("priority", pa.int32()),
    ("seq_in_conv", pa.int64()),
    ("hour", pa.timestamp("us")),
    ("sink_tag", pa.string()),
]
ENRICHED = pa.schema(list(PARSED) + [pa.field(n, t) for n, t in ENRICHED_EXTRA])

# Per-sink aggregate counts (FIXTURES.md §5).
SINK_COUNTS = pa.schema(
    [
        ("sink_tag", pa.string()),
        ("role", pa.string()),
        ("tool", pa.string()),      # parsed_tool, "" for none
        ("hour", pa.timestamp("us")),
        ("n", pa.int64()),
    ]
)

SINKS = ("errors", "tools", "chat")  # primary, mutually exclusive
AUDIT_SINK = "audit"                 # broadcast: receives all priority>=2 rows
