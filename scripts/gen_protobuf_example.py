"""Generate the input for examples/protobuf_roundtrip.yaml: a parquet file
of varint-delimited protobuf frame blobs plus the .proto schema, built with
the repo's own pure-Python wire codec (deterministic, seed-free content)."""

import os
import sys

import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from node_shovel_ray.functions.proto_codec import encode_message, parse_proto
from node_shovel_ray.stages.decode import write_delimited

PROTO = """
message Turn {
  required string conv_id = 1;
  required int32 turn_idx = 2;
  required string text = 3;
}
"""

OUT = os.environ.get("NSR_PROTO_DIR", "/tmp/nsr_proto_example")


def main() -> None:
    os.makedirs(OUT, exist_ok=True)
    with open(os.path.join(OUT, "turn.proto"), "w") as fh:
        fh.write(PROTO)
    schema = parse_proto(PROTO)
    blobs = []
    for conv in range(8):
        records = [
            encode_message(
                schema,
                "Turn",
                {"conv_id": f"conv-{conv:04d}", "turn_idx": i, "text": f"turn {i} of {conv}"},
            )
            for i in range(5)
        ]
        blobs.append(write_delimited(records))
    pq.write_table(
        pa.table({"payload": pa.array(blobs, pa.binary())}),
        os.path.join(OUT, "frames.parquet"),
    )
    print(f"wrote {len(blobs)} delimited frames to {OUT}")


if __name__ == "__main__":
    main()
