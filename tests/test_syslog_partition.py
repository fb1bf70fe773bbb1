import glob
import os

import pyarrow as pa

import ray.data as rd

from node_shovel_ray.stages.encode import write_time_partitioned
from node_shovel_ray.stages.parse import parse_syslog_batch


def test_parse_syslog_golden():
    # mirrors the reference syslog input's parse (src/inputs/syslog.js:44-56)
    lines = [
        "<34>Oct 11 22:14:15 mymachine su[230]: 'su root' failed for lonvick",
        "<13>Feb  5 17:32:18 10.0.0.99 myproc: Use the BFG!",
        "not a syslog line at all",
        None,
    ]
    out = parse_syslog_batch(pa.table({"text": pa.array(lines, pa.string())}))
    assert out["parse_ok"].to_pylist() == [True, True, False, False]
    assert out["pri"].to_pylist()[:2] == [34, 13]
    assert out["severity"].to_pylist()[:2] == [2, 5]     # 34&7, 13&7
    assert out["facility"].to_pylist()[:2] == [4, 1]     # 34>>3, 13>>3
    assert out["sl_host"].to_pylist()[:2] == ["mymachine", "10.0.0.99"]
    assert out["sl_prog"].to_pylist()[:2] == ["su", "myproc"]
    assert out["sl_pid"].to_pylist()[:2] == ["230", None]
    assert out["sl_msg"][0].as_py() == "'su root' failed for lonvick"


def test_write_time_partitioned(tmp_path):
    t = pa.table(
        {
            "v": pa.array([1, 2, 3], pa.int64()),
            "ts": pa.array(
                [1735693200000000, 1735779600000000, 1735693300000000],
                pa.timestamp("us"),
            ),  # two days
        }
    )
    out = write_time_partitioned(rd.from_arrow(t), str(tmp_path / "p"), granularity="day")
    parts = sorted(os.path.basename(p) for p in glob.glob(os.path.join(out, "*")))
    assert parts == ["_part=2025-01-01", "_part=2025-01-02"]
