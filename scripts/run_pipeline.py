"""CLI entrypoint — the `shovel --pipeline p.yml` analogue (reference:
src/cli.js, src/index.js:28-35), runnable directly or via ray job submit:

    python scripts/run_pipeline.py pipeline.yaml [more.yaml ...] [--stats]
    ray job submit --working-dir . -- python scripts/run_pipeline.py pipeline.yaml

``--stats`` prints per-operator wall time / tasks / rows after each run
(the reference's aggregated-metrics dump, src/core/aggregated_metrics.js).

Each YAML is compiled by node_shovel_ray.pipelines.config (env interpolation,
plugin registry) and executed; results/row counts are printed per pipeline.
Owns the Ray session (guarded init, shutdown on exit).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv: list[str]) -> int:
    if not argv or argv[0] in ("-h", "--help"):
        print(__doc__)
        return 0

    import ray

    if not ray.is_initialized():
        ray.init(
            address=os.environ.get("RAY_ADDRESS", "local"),
            include_dashboard=False,
            ignore_reinit_error=True,
            logging_level="ERROR",
        )
    try:
        from ray.data import DataContext

        DataContext.get_current().enable_progress_bars = False

        from node_shovel_ray.pipelines.config import PipelineConfig, build

        show_stats = "--stats" in argv
        for path in [a for a in argv if not a.startswith("--")]:
            cfg = PipelineConfig.from_yaml(path)
            print(f"[{cfg.name}] running ({path})")
            capture: dict = {}
            result = build(cfg, capture=capture)()
            import ray.data as rd

            if isinstance(result, rd.Dataset):
                print(f"[{cfg.name}] -> dataset, {result.count()} rows")
            else:
                print(f"[{cfg.name}] -> {result}")
            if show_stats and "dataset" in capture:
                # per-operator wall/rows — the reference's aggregated
                # metrics dump for a finished run
                from node_shovel_ray.state.metrics import parse_operator_stats

                try:
                    ops = parse_operator_stats(capture["dataset"].stats())
                except Exception:
                    ops = []
                for op in ops:
                    rows = "-" if op["rows_out"] is None else op["rows_out"]
                    print(
                        f"[{cfg.name}]   {op['operator']}: {op['wall_sec']:.2f}s"
                        f" / {op['tasks']} tasks / {rows} rows out"
                    )
        return 0
    finally:
        import ray

        ray.shutdown()


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
