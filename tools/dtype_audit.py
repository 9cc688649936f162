"""Representation audit: pandas dtypes of every Spark query vs its DuckDB
oracle twin.

The driver's value-hash is representation-sensitive where the local
compare is tolerant: DuckDB SUM(BIGINT) returns HUGEINT (float64/object
in pandas) while Spark returns int64 — same values, different hash. This
caught supplier_part_margin in round 2. Run after adding oracles:

    python tools/dtype_audit.py [sf_dir]

Exits non-zero on any int-vs-float or tz-aware-vs-naive mismatch (the
classes known to break the driver's hash); prints every mismatch either
way (datetime ns-vs-us and int32-vs-int64 are benign, listed FYI).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

import __spark_entry__ as entrymod
from data_streaming_and_visualization_with_kafka_spark_streaming_elasticsearch_and_kibana_spark import (
    get_spark,
)
from data_streaming_and_visualization_with_kafka_spark_streaming_elasticsearch_and_kibana_spark.schemas import (
    TEST_TABLES,
)

INT = {"int8", "int16", "int32", "int64"}
FLOAT = {"float32", "float64"}


def severity(s: str, o: str) -> str:
    if s == "<missing>" or o == "<missing>":
        return "BREAKS"  # column-name mismatch always fails the driver
    if (s in INT and o in FLOAT) or (s in FLOAT and o in INT):
        return "BREAKS"
    if ("datetime" in s) != ("datetime" in o):
        return "BREAKS"
    if "datetime" in s and (("," in s) != ("," in o)):  # tz-aware vs naive
        return "BREAKS"
    if s == "object" or o == "object":
        return "BREAKS"  # e.g. Decimal column from DECIMAL literals
    return "benign"


def audit(
    spark, sf_dir: str, names: list[str] | None = None, verbose: bool = True
) -> list[str]:
    """Run the representation audit; returns the list of BREAKING
    findings (empty = driver-hash-safe). Importable so the test suite
    can gate the driver window (tests/test_driver_contract.py) with the
    same logic the CLI uses."""
    con = duckdb.connect()
    for t in TEST_TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracles = entrymod.oracle_sql()
    breaking: list[str] = []
    for name, fn in entrymod.queries().items():
        if name not in oracles or (names is not None and name not in names):
            continue
        try:
            sdf = fn(spark, sf_dir).toPandas()
            odf = con.sql(oracles[name]).df()
        except Exception as e:
            breaking.append(f"ERR {name}: {str(e)[:120]}")
            if verbose:
                print(breaking[-1])
            continue
        sd = {c: str(sdf[c].dtype) for c in sdf.columns}
        od = {c: str(odf[c].dtype) for c in odf.columns}
        for c in sorted(set(sd) | set(od)):
            s, o = sd.get(c, "<missing>"), od.get(c, "<missing>")
            if s != o:
                sev = severity(s, o)
                if verbose:
                    print(f"{sev:6s}{name}.{c}: spark={s} duck={o}")
                if sev == "BREAKS":
                    breaking.append(f"{name}.{c}: spark={s} duck={o}")
    return breaking


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark(shuffle_partitions=8)
    bad = audit(spark, sf_dir)
    print("CLEAN" if not bad else f"{len(bad)} BREAKING mismatches")
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
