"""Local mirror of the driver's DuckDB-oracle correctness gate.

Runs every queries() entry and its oracle_sql() twin, compares row count,
column names, and order-insensitive values (floats to 1e-9 after the
queries' own rounding). Usage:

    python tools/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import sys
import time

import duckdb
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod
from data_streaming_and_visualization_with_kafka_spark_streaming_elasticsearch_and_kibana_spark import (
    get_spark,
)
from data_streaming_and_visualization_with_kafka_spark_streaming_elasticsearch_and_kibana_spark.schemas import (
    TEST_TABLES,
)


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if str(df[c].dtype).startswith("datetime"):
            df[c] = pd.to_datetime(df[c]).dt.tz_localize(None)
        elif df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(by=list(df.columns), ignore_index=True)


def _is_numeric(s: pd.Series) -> bool:
    return pd.api.types.is_numeric_dtype(s)


def compare(a: pd.DataFrame, b: pd.DataFrame) -> str | None:
    if len(a) != len(b):
        return f"row count {len(a)} vs {len(b)}"
    if sorted(a.columns) != sorted(b.columns):
        return f"columns {sorted(a.columns)} vs {sorted(b.columns)}"
    a, b = normalize(a), normalize(b)
    for c in a.columns:
        av, bv = a[c], b[c]
        if pd.api.types.is_bool_dtype(av) or pd.api.types.is_bool_dtype(bv):
            # numpy bools break arithmetic compare; exact match via int
            av = av.astype("float64")
            bv = bv.astype("float64")
            match = (av.isna() & bv.isna()) | (av == bv)
        elif _is_numeric(av) and _is_numeric(bv):
            # coerce int64-vs-float64 pairs numerically (never via str —
            # '1' != '1.0') and compare with tolerance
            av = pd.to_numeric(av, errors="coerce")
            bv = pd.to_numeric(bv, errors="coerce")
            match = (av.isna() & bv.isna()) | ((av - bv).abs() < 1e-9)
        else:
            if av.dtype != bv.dtype:
                av, bv = av.astype(str), bv.astype(str)
            if av.dtype == object:
                match = av.fillna("<N>") == bv.fillna("<N>")
            else:
                match = (av.isna() & bv.isna()) | (av == bv)
        if not match.all():
            mism = ~match  # same predicate as the pass/fail decision
            return (
                f"values differ in col {c}; first rows:\n"
                f"spark:\n{a[mism][:3]}\nduck:\n{b[mism][:3]}"
            )
    return None


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])
    if os.environ.get("VANILLA_SESSION") == "1":
        # mimic the driver's correctness harness: bare session with none of
        # get_spark's confs — queries must be session-independent
        from pyspark.sql import SparkSession

        spark = (
            SparkSession.builder.appName("oracle-vanilla")
            .master("local[8]")
            .config("spark.ui.enabled", "false")
            .getOrCreate()
        )
    else:
        spark = get_spark(shuffle_partitions=8)
    con = duckdb.connect()
    for t in TEST_TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as e:
            print(f"FAIL {name}: spark error: {e}")
            failures += 1
            continue
        if name not in oracles:
            print(f"ok   {name}: rows-only ({len(sdf)} rows, {time.time()-t0:.1f}s)")
            if len(sdf) == 0:
                print(f"WARN {name}: zero rows")
            continue
        try:
            odf = con.sql(oracles[name]).df()
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}")
            failures += 1
            continue
        err = compare(sdf, odf)
        if err:
            print(f"FAIL {name}: {err}")
            failures += 1
        else:
            print(f"ok   {name}: {len(sdf)} rows match ({time.time()-t0:.1f}s)")
    print(f"\n{'ALL OK' if failures == 0 else f'{failures} FAILURES'}")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
