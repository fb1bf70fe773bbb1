from __future__ import annotations

import pytest
import ray


@pytest.fixture(scope="session", autouse=True)
def ray_session():
    ray.init(
        address="local",
        num_cpus=4,
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
    )
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    yield
    ray.shutdown()


@pytest.fixture(scope="session")
def tiny_fixture(tmp_path_factory):
    """FIXTURES.md 'tiny' scale: 100 convs / ~2k turns, written as sharded parquet."""
    from node_shovel_ray.gen import write_fixture

    out = tmp_path_factory.mktemp("tiny")
    write_fixture(str(out), n_convs=100, seed=42, n_files=4)
    return str(out)


@pytest.fixture(scope="session")
def tiny_tables():
    """In-memory (transcripts, conv_meta) Arrow tables, tiny scale."""
    from node_shovel_ray.gen import gen_transcripts

    return gen_transcripts(n_convs=100, seed=42)
