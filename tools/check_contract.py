"""Local mimic of the driver's correctness gate.

Runs every ``__spark_entry__.queries()`` entry at the given sf dir and
compares row count, column names, and order-insensitive values against
the matching ``oracle_sql()`` run through DuckDB (tables registered as
views over the parquet files).

Usage: python tools/check_contract.py [sf_dir] [name ...]
(optional names restrict the run to those contract entries)
"""

from __future__ import annotations

import sys

sys.path.insert(0, ".")

import duckdb
import pandas as pd

import __spark_entry__ as entrymod
from mwmbl_spark import get_spark

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[us]").astype(str)
        elif pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].astype("float64").round(6)
        elif pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("int64")
        elif df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(by=list(df.columns), ignore_index=True)


def main(sf_dir: str, only: list[str] | None = None) -> int:
    import os

    # twin-based oracles (search pipeline family, MMR, HTML walk) embed
    # values computed FROM the corpus — regenerate them at the sf under
    # test instead of the driver's sf0.01 default (oracle generation is
    # lazy, so setting this before oracle_sql() is sufficient)
    os.environ["MWMBL_TWIN_SF_DIR"] = sf_dir
    spark = get_spark("check-contract", cores=8, shuffle_partitions=8)
    con = duckdb.connect()
    # single-threaded oracle evaluation (r7 root-cause of the one red
    # r6 driver row): DuckDB's PARALLEL sum accumulates float partials
    # in a chunk order that varies run to run, so a query with
    # exact-score ties (passage_topk's stride-overlapping windows) flips
    # its tie-broken ranks nondeterministically — measured 15/20 runs
    # matching the stable single-threaded result at threads=8 and worse
    # at defaults. threads=1 is bit-stable across runs; the engine side
    # is independently bit-stable via bm25_scores' canonical
    # ascending-term summation, and the two stable orders agree.
    con.execute("SET threads=1")
    for t in TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    qs = entrymod.queries()
    if only:
        qs = {n: f for n, f in qs.items() if n in only}
    oracles = entrymod.oracle_sql()
    failures = []
    for name, fn in qs.items():
        try:
            got = fn(spark, sf_dir).toPandas()
        except Exception as e:  # noqa: BLE001
            failures.append((name, f"spark error: {e}"))
            print(f"FAIL {name}: spark error: {e}")
            continue
        if name not in oracles:
            print(f"SKIP {name}: no oracle (rows={len(got)})")
            continue
        try:
            want = con.sql(oracles[name]).df()
        except Exception as e:  # noqa: BLE001
            failures.append((name, f"oracle error: {e}"))
            print(f"FAIL {name}: oracle error: {e}")
            continue
        if sorted(got.columns) != sorted(want.columns):
            failures.append((name, f"columns {sorted(got.columns)} != {sorted(want.columns)}"))
            print(f"FAIL {name}: columns {sorted(got.columns)} != {sorted(want.columns)}")
            continue
        if len(got) != len(want):
            failures.append((name, f"rows {len(got)} != {len(want)}"))
            print(f"FAIL {name}: rows {len(got)} != {len(want)}")
            continue
        g, w = normalize(got), normalize(want)
        if not g.equals(w):
            diff = (g != w).any(axis=1)
            failures.append((name, "value mismatch"))
            print(f"FAIL {name}: value mismatch, first diffs:")
            print(pd.concat([g[diff].head(3), w[diff].head(3)], keys=["spark", "duckdb"]))
            continue
        print(f"OK   {name}: rows={len(got)}")
    spark.stop()
    if failures:
        print(f"\n{len(failures)} FAILURES: {[f[0] for f in failures]}")
        return 1
    print("\nall queries match oracle")
    return 0


if __name__ == "__main__":
    sys.exit(
        main(
            sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01",
            sys.argv[2:] or None,
        )
    )
