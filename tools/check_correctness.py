"""Local replica of the driver's t2 correctness gate: run each
queries() entry on Spark and its oracle_sql() on DuckDB at sf0.01,
compare row count, schema width, and order-insensitive values.

Usage: python tools/check_correctness.py [query_name ...]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

import duckdb
import numpy as np
import pandas as pd

import __spark_entry__ as entry_mod
from optbinning_spark import get_spark

import os

SF_DIR = os.environ.get("SPARK_GRAFT_CHECK_SF", "/root/testdata/sf0.01")
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def canon(df: pd.DataFrame, strict: bool = True) -> pd.DataFrame:
    """Canonical form for value comparison.

    strict=True emulates the driver's value hash: every cell is
    rendered by repr, so an int64 20046 vs a float64 20046.0 (DuckDB
    HUGEINT sums surface as floats in pandas) MISMATCHES — oracles
    must CAST integer sums to BIGINT.
    """
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if strict:
            if pd.api.types.is_integer_dtype(df[c]):
                # nullable Int64 with pd.NA raises on astype('int64');
                # report that query as FAIL, don't abort the whole run
                try:
                    df[c] = df[c].astype("int64").map(repr)
                except (ValueError, TypeError):
                    df[c] = df[c].map(
                        lambda v: "<NULL>" if pd.isna(v) else repr(int(v)))
            elif pd.api.types.is_float_dtype(df[c]):
                df[c] = df[c].astype("float64").map(repr)
            else:
                # normalize nulls to one sentinel: Spark surfaces string
                # NULLs as None (repr 'None'), DuckDB as NaN; guard
                # pd.isna for array-valued cells (ambiguous truth)
                def _obj_repr(v):
                    try:
                        if pd.isna(v):
                            return "<NULL>"
                    except (TypeError, ValueError):
                        pass
                    return repr(v)

                df[c] = df[c].map(_obj_repr)
        else:
            try:
                num = pd.to_numeric(df[c])
                df[c] = num.astype("float64").round(9)
            except (ValueError, TypeError):
                df[c] = df[c].astype(str)
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def main():
    only = set(sys.argv[1:])
    spark = get_spark(cpus=8)
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    n_pass = n_fail = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, SF_DIR).toPandas()
        except Exception as e:
            print(f"FAIL {name}: spark error {type(e).__name__}: {str(e)[:300]}")
            n_fail += 1
            continue
        if name not in oracles:
            print(f"rows-only {name}: {len(sdf)} rows  ({time.time()-t0:.1f}s)")
            n_pass += 1
            continue
        try:
            odf = con.execute(oracles[name]).df()
        except Exception as e:
            print(f"FAIL {name}: oracle error {str(e)[:300]}")
            n_fail += 1
            continue
        a, b = canon(sdf), canon(odf)
        if list(a.columns) != list(b.columns):
            print(f"FAIL {name}: columns {list(a.columns)} vs {list(b.columns)}")
            n_fail += 1
            continue
        if len(a) != len(b):
            print(f"FAIL {name}: rows {len(a)} vs {len(b)}")
            n_fail += 1
            continue
        if not a.equals(b):
            neq = (a != b) & ~(a.isna() & b.isna())
            bad = neq.any(axis=1)
            print(f"FAIL {name}: {bad.sum()} mismatched rows of {len(a)}")
            print("spark:", a[bad].head(3).to_dict("records"))
            print("duck :", b[bad].head(3).to_dict("records"))
            n_fail += 1
            continue
        print(f"PASS {name}: {len(a)} rows  ({time.time()-t0:.1f}s)")
        n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail")
    # keep the README's generated oracle-count honest (round-5 verdict:
    # the hand-maintained sentence went stale one commit after landing)
    try:
        sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
        from update_readme_counts import generated_sentence

        readme = open(os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "README.md")).read()
        if generated_sentence() not in readme:
            print("NOTE: README oracle-count is stale — run "
                  "tools/update_readme_counts.py")
    except Exception:
        pass
    spark.stop()
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
