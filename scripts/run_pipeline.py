"""CLI entrypoint — the `shovel --pipeline p.yml` analogue (reference:
src/cli.js, src/index.js:28-35), runnable directly or via ray job submit:

    python scripts/run_pipeline.py pipeline.yaml [more.yaml ...]
    ray job submit --working-dir . -- python scripts/run_pipeline.py pipeline.yaml

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

        for path in argv:
            cfg = PipelineConfig.from_yaml(path)
            print(f"[{cfg.name}] running ({path})")
            result = build(cfg)()
            import ray.data as rd

            if isinstance(result, rd.Dataset):
                print(f"[{cfg.name}] -> dataset, {result.count()} rows")
            else:
                print(f"[{cfg.name}] -> {result}")
        return 0
    finally:
        import ray

        ray.shutdown()


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
