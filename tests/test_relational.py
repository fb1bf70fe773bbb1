"""Plan-equivalence tests for relational operators with multiple physical
plans (the oracle gate checks one plan; these pin that the alternates
produce the same rows)."""

import pandas as pd

from node_shovel_ray.pipelines.relational import range_join_events_orders

SF = "/root/testdata/sf0.001"


def _canon(ds):
    return (
        ds.to_pandas()
        .sort_values("event_id")
        .reset_index(drop=True)
        .astype({"event_id": "int64", "n_recent_orders": "int64"})
    )


def test_range_join_bucketed_matches_broadcast(ray_session):
    """VERDICT r2 #2: the bucket-both-sides fallback must exist, be
    force-selectable, and produce exactly the broadcast plan's output."""
    bc = _canon(range_join_events_orders(SF))
    bk = _canon(range_join_events_orders(SF, force_bucketed=True))
    pd.testing.assert_frame_equal(bk, bc)
    assert (bc["n_recent_orders"] == 0).any()  # left-join semantics survive


def test_range_join_auto_switch_on_dimension_size(ray_session):
    """A tiny broadcast_max_bytes budget must auto-select the bucketed plan
    (same rows either way)."""
    bc = _canon(range_join_events_orders(SF))
    auto = _canon(range_join_events_orders(SF, broadcast_max_bytes=1))
    pd.testing.assert_frame_equal(auto, bc)
