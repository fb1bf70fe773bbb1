"""Stage library: batch transforms composing into shovel-equivalent DAGs.

Each module maps one reference stage family onto Ray Data:

- :mod:`.parse`        decoder / grok extraction (reference: src/inputs/syslog.js:44-56)
- :mod:`.decode`       format decoders json/csv/base64/msgpack (src/decoders/)
- :mod:`.encode`       format encoders incl. template projection (src/encoders/)
- :mod:`.enrich`       lookup join + per-conv sequence numbering (pipeline-UDF idiom)
- :mod:`.route`        out/ignore/reject outcome routing + sink fan-out
  (src/core/node.js:214-271, src/outputs/pipeline.js:18-30)
- :mod:`.aggregate`    per-sink counters as data-level aggregates
  (src/core/processor.js:26-36 promoted to groupby)
"""
