"""Golden-file test for the sensor-fusion pipeline (SURVEY §5.2).

Synthetic per-sensor headerless CSVs shaped exactly like the reference's
inputs (data_collector.py:16-20: per-room `<metric>.csv` with
(timestamp, value) rows) are fused by the engine's one-plan pipeline and
compared against an independently-computed pandas golden implementing
the documented semantics: per-room inner join on timestamp → room
column → minute floor → group mean (merged_sensor_data_grouped.csv
shape).
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pytest

from data_streaming_and_visualization_with_kafka_spark_streaming_elasticsearch_and_kibana_spark.operators import (
    fusion,
)
from data_streaming_and_visualization_with_kafka_spark_streaming_elasticsearch_and_kibana_spark.schemas import (
    SENSOR_METRICS,
)
from data_streaming_and_visualization_with_kafka_spark_streaming_elasticsearch_and_kibana_spark.sources.readers import (
    read_sensor_tree,
)

#: per-room raw readings: timestamp → value per metric (None = missing row)
FIXTURE = {
    "room1": {
        # 1100/1110 share a minute bucket → exercises the group mean;
        # pir misses 1030 → inner join drops that timestamp entirely
        "co2": {1000.0: 400.0, 1030.0: 410.0, 1100.0: 420.0, 1110.0: 430.0},
        "light": {1000.0: 10.0, 1030.0: 11.0, 1100.0: 12.0, 1110.0: 13.0},
        "temp": {1000.0: 20.0, 1030.0: 21.0, 1100.0: 22.0, 1110.0: 23.0},
        "humidity": {1000.0: 50.0, 1030.0: 51.0, 1100.0: 52.0, 1110.0: 53.0},
        "pir": {1000.0: 0.0, 1100.0: 1.0, 1110.0: 0.0},
    },
    "room2": {m: {2000.0: float(i)} for i, m in enumerate(SENSOR_METRICS)},
}


def _write_tree(root: str) -> None:
    for room, metrics in FIXTURE.items():
        os.makedirs(f"{root}/{room}", exist_ok=True)
        for metric, series in metrics.items():
            with open(f"{root}/{room}/{metric}.csv", "w") as f:
                for ts, v in sorted(series.items()):
                    f.write(f"{ts},{v}\n")


def _pandas_golden() -> pd.DataFrame:
    """Documented reference semantics, computed independently in pandas."""
    per_room = []
    for room, metrics in FIXTURE.items():
        df = None
        for m in SENSOR_METRICS:
            mdf = pd.DataFrame(
                {"timestamp": list(metrics[m]), m: list(metrics[m].values())}
            )
            df = mdf if df is None else df.merge(mdf, on="timestamp", how="inner")
        df["room"] = room
        ts = pd.to_datetime(df["timestamp"], unit="s")
        df["event_ts_min"] = ts.dt.floor("min")
        df["ts_min_bignt"] = df["event_ts_min"].astype("int64") // 10**9
        per_room.append(
            df.groupby(["event_ts_min", "ts_min_bignt", "room"], as_index=False).mean()
        )
    return pd.concat(per_room, ignore_index=True)


def test_fusion_pipeline_matches_pandas_golden(spark, tmp_dir):
    root = f"{tmp_dir}/KETI"
    _write_tree(root)
    metric_dfs = {
        m: read_sensor_tree(spark, root, m) for m in SENSOR_METRICS
    }
    fused = fusion.sensor_fusion_pipeline(metric_dfs).toPandas()
    golden = _pandas_golden()

    cols = ["event_ts_min", "ts_min_bignt", "room", "timestamp", *SENSOR_METRICS]
    fused = fused[cols].sort_values(["room", "ts_min_bignt"], ignore_index=True)
    golden = golden[cols].sort_values(["room", "ts_min_bignt"], ignore_index=True)

    # room1: ts 1030 dropped by the inner join (pir missing) → buckets
    # 960 and 1080 remain; room2: one bucket
    assert len(fused) == len(golden) == 3
    assert list(fused["room"]) == list(golden["room"])
    assert list(fused["event_ts_min"]) == list(golden["event_ts_min"])
    assert list(fused["ts_min_bignt"]) == list(golden["ts_min_bignt"])
    for c in ["timestamp", *SENSOR_METRICS]:
        np.testing.assert_allclose(fused[c].to_numpy(), golden[c].to_numpy())


def test_fusion_inner_join_drops_incomplete_timestamps(spark, tmp_dir):
    root = f"{tmp_dir}/KETI"
    _write_tree(root)
    metric_dfs = {m: read_sensor_tree(spark, root, m) for m in SENSOR_METRICS}
    fused = fusion.fuse_sensor_tables(metric_dfs)
    stamps = {
        (r.room, r.timestamp) for r in fused.select("room", "timestamp").collect()
    }
    assert ("room1", 1030.0) not in stamps  # pir had no 1030 reading
    assert ("room1", 1000.0) in stamps and ("room2", 2000.0) in stamps


def test_minute_rollup_counts(spark, tmp_dir):
    root = f"{tmp_dir}/KETI"
    _write_tree(root)
    metric_dfs = {m: read_sensor_tree(spark, root, m) for m in SENSOR_METRICS}
    rolled = fusion.sensor_fusion_pipeline(metric_dfs)
    by_bucket = {
        (r.room, r.ts_min_bignt): r.n for r in rolled.collect()
    }
    assert by_bucket[("room1", 1080)] == 2  # 1100 + 1110 share the minute
    assert by_bucket[("room1", 960)] == 1
    assert by_bucket[("room2", 1980)] == 1
