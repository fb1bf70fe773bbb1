"""Scalar/utility functions (reference: src/core/utils.js) plus the
large-scale training-data operations (dedup, similarity search, text
analysis) that make the engine useful at 100 TB."""
