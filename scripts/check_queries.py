"""Dev tool: run queries() vs oracle_sql() one at a time with timings.

Usage: python scripts/check_queries.py [--json OUT.json] [sf_dir] [name ...]

With --json, writes a per-query record (pass/fail, rows, engine/sql seconds)
so a full-sweep result can be committed as an artifact (VERDICT r4 #2).
"""

import json
import sys
import time

sys.path.insert(0, ".")

import duckdb
import numpy as np
import pandas as pd
import ray

_argv = sys.argv[1:]
JSON_OUT = None
if _argv and _argv[0] == "--json":
    JSON_OUT = _argv[1]
    _argv = _argv[2:]
SF_DIR = _argv[0] if _argv else "/root/testdata/sf0.001"
ONLY = _argv[1:]

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def duck(sql):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')")
    return con.execute(sql).fetchdf()


def canon(df):
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("int64")
        elif pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].astype(np.float64)
        elif pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("Int64")
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def to_pandas(res):
    import pyarrow as pa
    import ray.data

    if isinstance(res, ray.data.Dataset):
        return res.to_pandas()
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res


def main():
    ray.init(address="local", num_cpus=8, include_dashboard=False,
             ignore_reinit_error=True, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    import __ray_entry__ as e

    qs, oracles = e.queries(), e.oracle_sql()
    names = ONLY or list(qs)
    n_pass = n_fail = 0
    records = {}
    for name in names:
        t0 = time.time()
        try:
            got = canon(to_pandas(qs[name](SF_DIR)))
            t1 = time.time()
            if name in oracles:
                want = canon(duck(oracles[name]))
                assert list(got.columns) == list(want.columns), (
                    f"cols {list(got.columns)} vs {list(want.columns)}"
                )
                assert len(got) == len(want), f"rows {len(got)} vs {len(want)}"
                pd.testing.assert_frame_equal(got, want, check_dtype=False, rtol=0, atol=0)
                print(f"PASS {name:22s} rows={len(got):7d} engine={t1-t0:6.2f}s sql={time.time()-t1:5.2f}s")
                records[name] = {"status": "pass", "rows": int(len(got)),
                                 "engine_s": round(t1 - t0, 2),
                                 "sql_s": round(time.time() - t1, 2)}
            else:
                print(f"ROWS {name:22s} rows={len(got):7d} engine={t1-t0:6.2f}s (rows-only)")
                records[name] = {"status": "rows_only", "rows": int(len(got)),
                                 "engine_s": round(t1 - t0, 2)}
            n_pass += 1
        except Exception as ex:
            n_fail += 1
            print(f"FAIL {name:22s} {type(ex).__name__}: {str(ex)[:400]}")
            records[name] = {"status": "fail",
                             "err": f"{type(ex).__name__}: {str(ex)[:400]}"}
    print(f"\n{n_pass} pass, {n_fail} fail")
    if JSON_OUT:
        with open(JSON_OUT, "w") as f:
            json.dump({"sf_dir": SF_DIR, "n_pass": n_pass, "n_fail": n_fail,
                       "n_queries": len(names), "queries": records}, f, indent=1)
        print(f"wrote {JSON_OUT}")
    ray.shutdown()
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
