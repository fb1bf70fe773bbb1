import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data as rd

from node_shovel_ray.stages.window import (
    add_tumbling_window,
    sliding_count,
    tumbling_aggregate,
)


def _events():
    ts = [
        "2024-01-01T00:10:00", "2024-01-01T00:50:00",  # window 00:00
        "2024-01-01T01:00:00",                          # window 01:00 (end-exclusive)
        "2024-01-01T02:59:59",                          # window 02:00
    ]
    return pa.table(
        {
            "k": pa.array(["a", "a", "a", "b"]),
            "ts": pa.array([np.datetime64(t, "us") for t in ts]),
            "value": pa.array([1.0, 2.0, 4.0, 8.0]),
        }
    )


def test_tumbling_window_column():
    out = add_tumbling_window(_events(), size_s=3600)
    starts = [str(v)[:16] for v in out["window"].to_pylist()]
    assert starts == ["2024-01-01 00:00", "2024-01-01 00:00",
                      "2024-01-01 01:00", "2024-01-01 02:00"]


def test_tumbling_aggregate():
    out = (
        tumbling_aggregate(rd.from_arrow(_events()), keys=["k"], size_s=3600,
                           value_col="value")
        .to_pandas()
        .sort_values(["k", "window"])
        .reset_index(drop=True)
    )
    assert out["n"].tolist() == [2, 1, 1]
    assert out["sum_value"].tolist() == [3.0, 4.0, 8.0]


def test_sliding_count_vs_python():
    ds = rd.from_arrow(_events())
    out = sliding_count(ds, keys=["k"], size_s=3600, step_s=900).to_pandas()
    # python oracle: each event belongs to 4 windows (1h / 15min)
    df = _events().to_pandas()
    rows = []
    for _, r in df.iterrows():
        us = r["ts"].value // 1000  # ns → us
        last = (us // 900_000_000) * 900_000_000
        for i in range(4):
            rows.append((r["k"], pd.Timestamp((last - i * 900_000_000) * 1000)))
    want = (
        pd.DataFrame(rows, columns=["k", "window"])
        .groupby(["k", "window"]).size().reset_index(name="n")
    )
    got = out.sort_values(["k", "window"]).reset_index(drop=True)
    want = want.sort_values(["k", "window"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
