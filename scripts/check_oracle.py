"""Local replica of the driver's correctness gate: run every queries() entry
and its oracle_sql() twin on the same sf dir, compare row count, column set,
and order-insensitive values. Usage: python scripts/check_oracle.py [sf_dir].
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import numpy as np
import pandas as pd
import ray

import __ray_entry__ as E

TABLES = (
    "region nation customer supplier part orders lineitem events documents "
    "embeddings"
).split()


def to_pandas(res) -> pd.DataFrame:
    import pyarrow as pa
    import ray.data

    if isinstance(res, ray.data.Dataset):
        return res.to_pandas()
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if df[c].dtype == object:
            pass
        elif str(df[c].dtype).startswith("datetime"):
            df[c] = pd.to_datetime(df[c]).astype("datetime64[us]")
        elif df[c].dtype.kind in "iu":
            df[c] = df[c].astype("int64")
        elif df[c].dtype.kind == "f":
            df[c] = df[c].round(6)
        elif df[c].dtype.kind == "b":
            df[c] = df[c].astype(bool)
    return df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:]) or None
    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False,
                 logging_level="ERROR")
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    qs, oracles = E.queries(), E.oracle_sql()
    failed = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            mine = canon(to_pandas(fn(sf_dir)))
        except Exception as ex:
            print(f"FAIL {name}: query raised {type(ex).__name__}: {ex}")
            failed.append(name)
            continue
        sql = oracles.get(name)
        if sql is None:
            print(f"ok?  {name}: rows={len(mine)} (no oracle, rows-only)")
            continue
        try:
            ref = canon(con.execute(sql).df())
        except Exception as ex:
            print(f"FAIL {name}: oracle raised {type(ex).__name__}: {ex}")
            failed.append(name)
            continue
        if len(mine) != len(ref):
            print(f"FAIL {name}: rows {len(mine)} != oracle {len(ref)}")
            failed.append(name)
            continue
        if list(mine.columns) != list(ref.columns):
            print(f"FAIL {name}: cols {list(mine.columns)} != {list(ref.columns)}")
            failed.append(name)
            continue
        eq = mine.equals(ref)
        if not eq:
            # locate first mismatching cell for debugging
            found = False
            for c in mine.columns:
                a, b = mine[c], ref[c]
                neq = ~((a == b) | (a.isna() & b.isna()))
                if neq.any():
                    i = int(np.flatnonzero(neq.to_numpy())[0])
                    print(
                        f"FAIL {name}: col {c} row {i}: mine={a.iloc[i]!r} oracle={b.iloc[i]!r}"
                    )
                    found = True
                    break
            if not found:
                print(
                    f"FAIL {name}: values equal but dtypes differ: "
                    f"mine={dict(mine.dtypes.astype(str))} "
                    f"oracle={dict(ref.dtypes.astype(str))}"
                )
            failed.append(name)
        else:
            print(f"PASS {name}: rows={len(mine)}")
    print("FAILED:", failed if failed else "none")
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())
