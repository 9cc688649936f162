"""Sensor-fusion operators — the reference's batch ETL re-expressed as one
lazy Catalyst plan (vs. the eager per-room pandas loop of
`data_collector.py:11-49`).

Reference semantics covered:
  J1  chained inner equi-join of per-metric tables on `timestamp`
  P6  room dimension column
  F1/F2  epoch↔timestamp conversion
  A2  1-minute tumbling bucket (`dt.floor('T')`)
  A1  group-by (minute, room) mean of all metrics
  U1  per-room union — subsumed by a single globbed/unioned scan

Scale notes (100 TB): the per-metric join keys are (room, timestamp) —
co-partitioned by a single shuffle each; the minute-bucket aggregation
reuses partial aggregation (HashAggregate partial→final) so the shuffle
carries one row per (room, minute) per partition, not the raw readings.
At cluster scale write the fused output partitioned by date for
partition pruning downstream.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..schemas import SENSOR_METRICS


def fuse_sensor_tables(metric_dfs: dict[str, DataFrame]) -> DataFrame:
    """Inner-join per-metric tables on (room, timestamp).

    Each input df has columns (room, timestamp, <metric>). The reference
    joins on timestamp alone *within* a per-room loop
    (`data_collector.py:23`); joining on the composite key is the
    distributed equivalent — one plan for all rooms, rooms processed in
    parallel tasks instead of a Python for-loop.
    """
    dfs = [metric_dfs[m] for m in metric_dfs]
    return reduce(lambda a, b: a.join(b, ["room", "timestamp"], "inner"), dfs)


def minute_rollup(
    df: DataFrame,
    ts_col: str = "timestamp",
    keys: tuple[str, ...] = ("room",),
    metrics: tuple[str, ...] = SENSOR_METRICS,
    epoch_seconds: bool = True,
) -> DataFrame:
    """Minute-truncate + group mean → the fused wide table shape
    (`merged_sensor_data_grouped.csv` header).

    event_ts_min  = minute-floored event time   (A2, data_collector.py:32)
    ts_min_bignt  = epoch seconds of that minute (F2, data_collector.py:35)
    mean of every metric and of the raw timestamp (A1, data_collector.py:38)
    """
    ts = (
        F.timestamp_seconds(F.col(ts_col)) if epoch_seconds else F.col(ts_col)
    )
    bucketed = df.withColumn("event_ts_min", F.date_trunc("minute", ts)).withColumn(
        "ts_min_bignt", F.unix_timestamp(F.col("event_ts_min"))
    )
    aggs = (
        [F.avg(ts_col).alias(ts_col)]
        + [F.avg(m).alias(m) for m in metrics]
        + [F.count("*").alias("n")]
    )
    return bucketed.groupBy("event_ts_min", "ts_min_bignt", *keys).agg(*aggs)


def sensor_fusion_pipeline(metric_dfs: dict[str, DataFrame]) -> DataFrame:
    """Full E1 lifecycle (`data_collector.py` end-to-end) as one lazy plan:
    join → bucket → rollup. Catalyst fuses the projections; AQE picks
    join strategy (broadcast for small metric tables) at runtime.
    """
    fused = fuse_sensor_tables(metric_dfs)
    return minute_rollup(fused, metrics=tuple(metric_dfs.keys()))
