"""Local replica of the driver's correctness gate: run each queries() entry
and its oracle_sql() on sf0.01, compare row-count + schema + order-insensitive
values. Usage: python scripts/check_oracle.py [sf_dir] [query ...]
"""

import sys

import duckdb
import pandas as pd

sys.path.insert(0, ".")


def to_df(res) -> pd.DataFrame:
    import pyarrow as pa

    if isinstance(res, pd.DataFrame):
        return res
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res.to_pandas()  # ray Dataset


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)


def main():
    import ray

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    ray.init(address="local", num_cpus=8, include_dashboard=False,
             ignore_reinit_error=True, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    import __ray_entry__ as entrymod

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    con = duckdb.connect()
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        import time

        t0 = time.perf_counter()
        try:
            got = to_df(fn(sf_dir))
        except Exception as e:
            failures.append(name)
            print(f"[FAIL-run ] {name}: {type(e).__name__}: {e}")
            continue
        dt = time.perf_counter() - t0
        if name not in oracles:
            print(f"[rows-only] {name}: {len(got)} rows in {dt:.1f}s")
            continue
        want = con.execute(oracles[name]).fetchdf()
        g, w = canon(got), canon(want)
        status = []
        if len(g) != len(w):
            status.append(f"rowcount {len(g)} != {len(w)}")
        if list(g.columns) != list(w.columns):
            status.append(f"cols {list(g.columns)} != {list(w.columns)}")
        elif len(g) == len(w):
            try:
                pd.testing.assert_frame_equal(g, w, check_dtype=False)
            except AssertionError as e:
                status.append("values differ: " + str(e).split("\n")[1][:160])
        # dtype check (informational)
        dtypes_diff = [
            (c, str(g[c].dtype), str(w[c].dtype))
            for c in g.columns
            if c in w.columns and str(g[c].dtype) != str(w[c].dtype)
        ]
        if status:
            failures.append(name)
            print(f"[FAIL     ] {name} ({dt:.1f}s): {'; '.join(status)}")
        else:
            extra = f" dtypes~{dtypes_diff}" if dtypes_diff else ""
            print(f"[OK       ] {name}: {len(g)} rows in {dt:.1f}s{extra}")
    ray.shutdown()
    if failures:
        print("FAILURES:", failures)
        sys.exit(1)
    print("all checked queries OK")


if __name__ == "__main__":
    main()
