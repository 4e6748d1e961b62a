"""Local stand-in for the driver's correctness gate: run every queries()
entry at a given sf and compare to oracle_sql() via DuckDB (row count,
column names, order-insensitive value hash).

Usage: python tools/check_queries.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import sys
import time
import warnings

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

warnings.filterwarnings("ignore")


def to_pandas(obj):
    import pandas as pd
    import pyarrow as pa

    if isinstance(obj, pd.DataFrame):
        return obj
    if isinstance(obj, pa.Table):
        return obj.to_pandas()
    return obj.to_pandas()  # ray Dataset


def value_hash(df):
    import pandas as pd

    df = df.reindex(sorted(df.columns), axis=1)
    # normalize dtypes-ish: stringify everything deterministically
    rows = sorted(
        tuple(str(x) for x in row) for row in df.itertuples(index=False, name=None)
    )
    import hashlib

    h = hashlib.md5()
    for r in rows:
        h.update("\x1f".join(r).encode())
        h.update(b"\x1e")
    return h.hexdigest()


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import duckdb
    import ray

    ray.init(address="local", num_cpus=8, include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    import __ray_entry__ as entrymod

    qs = entrymod.queries()
    sqls = entrymod.oracle_sql()

    con = duckdb.connect()
    for t in "region nation customer supplier part orders lineitem events documents embeddings".split():
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    results = {}
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            got = to_pandas(fn(sf_dir))
            dt = time.time() - t0
        except Exception as e:
            results[name] = ("ERROR", f"{type(e).__name__}: {e}", 0)
            print(f"{name:28s} ERROR {type(e).__name__}: {str(e)[:120]}")
            continue
        if name in sqls:
            want = con.execute(sqls[name]).df()
            ok_rows = len(got) == len(want)
            ok_cols = sorted(got.columns) == sorted(want.columns)
            ok_hash = value_hash(got) == value_hash(want) if ok_rows and ok_cols else False
            status = "MATCH" if (ok_rows and ok_cols and ok_hash) else "MISMATCH"
            detail = f"rows {len(got)}/{len(want)} cols_ok={ok_cols} hash_ok={ok_hash}"
        else:
            status = "ROWS_ONLY"
            detail = f"rows {len(got)}"
        results[name] = (status, detail, dt)
        print(f"{name:28s} {status:9s} {detail}  ({dt:.1f}s)")

    bad = [n for n, (s, _, _) in results.items() if s in ("MISMATCH", "ERROR")]
    print(f"\n{len(results)} queries, {len(bad)} failing: {bad}")
    ray.shutdown()
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
