"""node_shovel_ray — a Ray-Data-native rebuild of mathquis/node-shovel.

Where the reference shuttles one Message at a time through an event-driven
input → decoder → pipeline → encoder → queue → output chain of Node.js
processes (reference: src/core/processor.js:79-84), this engine expresses the
same semantics as a streaming parse → enrich → route → aggregate DAG over
``ray.data.Dataset`` pipelines:

- decoders/encoders  → vectorized batch transforms (:mod:`.stages.decode`,
  :mod:`.stages.encode`)
- the pipeline UDF's out/ignore/reject outcomes → row-level outcome routing
  (:mod:`.stages.route`)
- enrich idioms (lookup joins, per-conversation sequence numbering) →
  broadcast joins + keyed ``map_groups`` (:mod:`.stages.enrich`)
- multi-output fan-out / broadcast (reference: src/outputs/pipeline.js:18-30)
  → tag-based sink branches (:mod:`.stages.route`, :mod:`.pipelines.flagship`)
- the persistent queue's replay-on-restart (reference: src/queues/batch.js:84-95)
  → per-partition checkpoint manifest with atomic renames (:mod:`.state.manifest`)

Never calls ``ray.init``/``ray.shutdown`` — sessions are owned by the caller
(bench.py, CLI, test fixture), per the driver contract.
"""

__version__ = "0.1.0"
