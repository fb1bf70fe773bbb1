"""Durability: per-partition checkpoint manifest with lineage + metrics —
the rebuild's replacement for the reference's persistent LevelDB queue and
its replay-on-restart (src/queues/batch.js:61-98, 84-95), made
partition-grained and idempotent (SURVEY.md §4.4)."""
