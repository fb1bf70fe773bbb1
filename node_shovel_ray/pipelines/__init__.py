"""Pipeline assemblies: the flagship parse→enrich→route→aggregate DAG, the
YAML pipeline-config layer, and the DuckDB oracle SQL used by the driver's
correctness gate."""
