"""Local replica of the driver's correctness gate: run every queries()
entry on Spark and its oracle_sql() on DuckDB at the same sf, compare
row-count + column names + order-insensitive values.

Type-faithful since r11 (VERDICT r10 item 1): the r10 driver red row
(q_code_pipeline) was invisible to the old checker because (a) it
fetched DuckDB results via fetchall(), where HUGEINT (DuckDB's output
type for SUM over integers) arrives as a plain Python int, and (b)
norm_cell coerced ints below 2**52 to float, erasing the int/float
distinction entirely.  The driver compares through pandas, where
DuckDB HUGEINT becomes float64 while Spark BIGINT stays int64 — a
type-sensitive hash mismatch.  This replica now mirrors that path:
both sides are fetched as pandas DataFrames (duckdb .df() /
pyspark .toPandas()) and cells normalize to ("i", v) / ("f", v)
tagged tuples so an int on one side never equals a float on the
other.  Local red == driver red for this class.

Usage: python scripts/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import numpy as np
import pandas as pd

import __spark_entry__ as entrymod
from kevinlang_spark.session import get_spark

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def norm_cell(v):
    """Normalize one cell TYPE-FAITHFULLY.

    ints and floats normalize to distinct tagged tuples: a DuckDB
    HUGEINT that pandas widened to float64 will NOT equal the same
    value as a Spark int64.  NaN and None both map to None — pandas
    represents SQL NULL in numeric columns as NaN on both engines, so
    the distinction is unobservable through the pandas path the
    driver uses.
    """
    if v is None:
        return None
    if isinstance(v, (np.bool_, bool)):
        return ("b", bool(v))
    if isinstance(v, np.integer):
        return ("i", int(v))
    if isinstance(v, np.floating):
        v = float(v)
    if isinstance(v, float):
        if math.isnan(v):
            return None
        return ("f", round(v, 6))
    if isinstance(v, int):
        return ("i", v)
    if isinstance(v, (np.ndarray, list, tuple)):
        return tuple(norm_cell(x) for x in v)
    if isinstance(v, dict):
        return tuple(sorted((str(k), norm_cell(x)) for k, x in v.items()))
    if v is pd.NaT:
        return None
    if isinstance(v, pd.Timestamp):
        return str(v.to_pydatetime())
    if isinstance(v, (bytes, bytearray)):
        return ("y", bytes(v))
    return str(v)


def norm_df(df):
    """Sort columns by name (driver contract), normalize cells, sort rows."""
    cols = sorted(df.columns)
    out = []
    for row in df[cols].itertuples(index=False, name=None):
        out.append(tuple(norm_cell(v) for v in row))
    out.sort(key=lambda t: tuple((x is None, str(x)) for x in t))
    return out


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    spark = get_spark("oracle-check")
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    n_pass = n_fail = n_rowsonly = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            spdf = sdf.toPandas()
        except Exception as e:
            print(f"FAIL {name}: spark error: {e}")
            n_fail += 1
            continue
        if name not in oracles:
            print(f"rows-only {name}: {len(spdf)} rows ({time.time()-t0:.1f}s)")
            n_rowsonly += 1
            continue
        try:
            dpdf = con.execute(oracles[name]).df()
        except Exception as e:
            print(f"FAIL {name}: duckdb error: {e}")
            n_fail += 1
            continue
        problems = []
        if len(spdf) != len(dpdf):
            problems.append(f"rowcount spark={len(spdf)} duck={len(dpdf)}")
        if sorted(spdf.columns) != sorted(dpdf.columns):
            problems.append(
                f"columns spark={sorted(spdf.columns)} duck={sorted(dpdf.columns)}"
            )
        if not problems:
            a = norm_df(spdf)
            b = norm_df(dpdf)
            if a != b:
                diff = [(x, y) for x, y in zip(a, b) if x != y][:3]
                problems.append(f"values differ; first diffs: {diff}")
        if problems:
            print(f"FAIL {name}: {'; '.join(problems)}")
            n_fail += 1
        else:
            print(f"PASS {name}: {len(spdf)} rows ({time.time()-t0:.1f}s)")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail, {n_rowsonly} rows-only")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
