#!/usr/bin/env python3
"""Local pre-flight for the driver's t2 gate (builder validation only; the
engine itself is pure Scala).

Faithful mirror of the driver's comparator — round 1's version materialized
the Spark parquet THROUGH DuckDB, which silently unified types on both sides
and passed 5 queries the driver failed. This version does what the driver
does:

  * Spark side: read the parquet dump directly with pandas/pyarrow.
  * Oracle side: run the SQL in DuckDB, fetch as a pandas frame.
  * Columns sorted by name; rows sorted via pandas sort_values (so an
    unsortable column — e.g. an ndarray cell — fails here exactly like it
    fails in the driver).
  * schema = column names; hash = pd.util.hash_pandas_object over the
    row-sorted frame, which is dtype-sensitive (int64 5 != float64 5.0 —
    the round-1 HUGEINT failure mode reproduces locally now).

Timestamps are normalized to datetime64[us] on both sides (Spark parquet
and DuckDB both use microsecond precision; pyarrow version differences can
surface ns).

Usage: python3 tools/check.py <sfDir> <verifyOutDir> [query ...]
"""
import datetime
import json, sys
import duckdb
import numpy as np
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(df):
    """Driver-shaped canonicalization: name-sorted columns, value-sorted
    rows, us-precision timestamps. Raises on unsortable cell types, as the
    driver does."""
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if str(df[c].dtype).startswith("datetime64"):
            df[c] = df[c].astype("datetime64[us]")
        elif df[c].dtype == object:
            # Spark DateType lands as object(datetime.date) via pyarrow while
            # DuckDB DATE fetches as datetime64 — proven benign in the
            # driver (d1/c1 passed round 1). Normalize to datetime64[us].
            nn = df[c].dropna()
            if len(nn) and all(isinstance(v, datetime.date) and
                               not isinstance(v, datetime.datetime)
                               for v in nn.head(100)):
                df[c] = pd.to_datetime(df[c]).astype("datetime64[us]")
    for c in df.columns:
        if df[c].isna().all():
            # no dtype information — unify the null representation
            df[c] = np.full(len(df), np.nan, dtype="float64")
    if len(df.columns):
        df = df.sort_values(by=list(df.columns))
    return df.reset_index(drop=True)


def frame_hash(df):
    return int(pd.util.hash_pandas_object(df, index=False).sum())


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    con.execute("SET TimeZone='UTC'")
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * "
                    f"FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        if only and name not in only:
            continue
        try:
            spark = canon(pd.read_parquet(f"{out_dir}/{name}"))
        except Exception as e:
            print(f"FAIL {name}: spark side unreadable/unsortable: {e!r}")
            n_fail += 1
            continue
        try:
            duck = canon(con.execute(sql).df())
        except Exception as e:
            print(f"FAIL {name}: oracle error/unsortable: {e!r}")
            n_fail += 1
            continue
        if list(spark.columns) != list(duck.columns):
            print(f"FAIL {name}: columns {list(spark.columns)} "
                  f"vs {list(duck.columns)}")
            n_fail += 1
            continue
        if len(spark) != len(duck):
            print(f"FAIL {name}: rows {len(spark)} vs {len(duck)}")
            n_fail += 1
            continue
        dt_s, dt_d = list(map(str, spark.dtypes)), list(map(str, duck.dtypes))
        # all-null columns carry no dtype information (e.g. a cast-failure
        # probe column) — dtype mismatch there is a representation artifact
        diff = [(c, a, b) for c, a, b in zip(spark.columns, dt_s, dt_d)
                if a != b and not (spark[c].isna().all() and
                                   duck[c].isna().all())]
        if diff:
            print(f"FAIL {name}: dtypes differ (spark vs duck): {diff}")
            n_fail += 1
            continue
        try:
            h_s, h_d = frame_hash(spark), frame_hash(duck)
        except Exception as e:
            print(f"FAIL {name}: unhashable frame: {e!r}")
            n_fail += 1
            continue
        if h_s != h_d:
            neq = (spark != duck) & ~(spark.isna() & duck.isna())
            bad_rows = neq.any(axis=1)
            i = int(bad_rows.idxmax()) if bad_rows.any() else -1
            print(f"FAIL {name}: hash mismatch "
                  f"({int(bad_rows.sum())} differing rows); first at {i}:\n"
                  f"  spark={spark.iloc[i].to_dict() if i >= 0 else '?'}\n"
                  f"  duck ={duck.iloc[i].to_dict() if i >= 0 else '?'}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(spark)} rows)")
            n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
