"""A real connector for the reference's sensor tree: Spark 4's Python
DataSource API (`pyspark.sql.datasource`) packaging the S1/S2 semantics
— headerless per-room `(timestamp, value)` CSVs under `root/<room>/
<metric>.csv`, room recovered from the path (data_collector.py:11-20)
— as a registered `format("sensor_tree")` source.

Why both this and `readers.read_sensor_tree` exist: the globbed-scan
reader is the right production path (JVM CSV parser, pushdown), and is
parity-pinned against this connector in tests. The connector is the
EXTENSIBILITY story: planning happens driver-side (one InputPartition
per room/metric file, so a 10,000-room tree reads with 10,000-way task
parallelism), parsing happens executor-side in `read()`, and the same
skeleton is what a genuinely custom feed (a sensor gateway's socket
protocol, a bespoke binary layout — things no built-in reader speaks)
would flesh out. Usage:

    spark.dataSource.register(SensorTreeDataSource)
    df = (spark.read.format("sensor_tree")
          .option("path", root).option("metric", "co2").load())
"""

from __future__ import annotations

import os

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)


class _FilePartition(InputPartition):
    def __init__(self, room: str, path: str):
        self.room = room
        self.path = path


def _parse_line(line: str, room: str):
    """Shared line parser for the batch and stream readers — ONE copy,
    because batch/stream row parity is a pinned contract (a parse fix
    applied to only one would silently break it). Malformed fields
    yield NULLs (PERMISSIVE), never a task failure."""
    ts_s, _, v_s = line.partition(",")
    try:
        ts = float(ts_s)
    except ValueError:
        ts = None
    try:
        v = float(v_s)
    except ValueError:
        v = None
    return (ts, v, room)


class SensorTreeReader(DataSourceReader):
    def __init__(self, root: str, metric: str):
        self.root = root
        self.metric = metric

    def partitions(self):
        """Planning: one partition per room file — the connector's split
        enumeration, equivalent to the JVM scan's file splits. Driver
        cost is one directory listing (bounded by room count, not row
        count)."""
        parts = []
        for room in sorted(os.listdir(self.root)):
            p = os.path.join(self.root, room, f"{self.metric}.csv")
            if os.path.isfile(p):
                parts.append(_FilePartition(room, p))
        return parts

    def read(self, partition):
        """Executor-side parse of one room's series. Malformed lines
        yield NULL fields rather than failing the task (the PERMISSIVE
        contract the engine's other sources follow)."""
        with open(partition.path) as f:
            for line in f:
                line = line.strip()
                if not line:
                    continue
                yield _parse_line(line, partition.room)


class SensorTreeStreamReader(SimpleDataSourceStreamReader):
    """Streaming half of the connector: tail the tree at LINE
    granularity — each micro-batch reads only lines appended since the
    committed offset `{room: lines_consumed}`. This is finer than the
    built-in file stream (which only ingests whole new files): the
    reference's sensors append to per-room CSVs in place, and this
    reader models that feed directly. Offsets are checkpointed by the
    engine, and `read(start)` re-derives the same rows for the same
    offset on append-only files — exactly-once on replay comes from the
    offset log, exactly like the Kafka source."""

    def __init__(self, root: str, metric: str):
        self.root = root
        self.metric = metric

    def initialOffset(self):
        return {"consumed": {}}

    def _complete_lines(self, path: str) -> list[str]:
        """Only newline-TERMINATED lines are consumable: a micro-batch
        firing while the sensor is mid-append must neither parse the
        torn tail as a (wrong) reading nor advance the offset past it —
        the completed line is picked up whole on the next batch."""
        with open(path) as f:
            text = f.read()
        cut = text.rfind("\n")
        return text[: cut + 1].splitlines() if cut >= 0 else []

    @staticmethod
    def _parse(line: str, room: str):
        return _parse_line(line, room)

    def _rows_slice(self, consumed: dict, bound: dict | None):
        """Rows in line range [consumed[room], bound[room]) per room
        (bound=None → to end of complete lines), plus the advanced
        offset. Deterministic for a fixed offset pair on append-only
        files — shared by read() (live tailing, unbounded) and
        readBetweenOffsets() (restart replay, end-bounded)."""
        consumed = dict(consumed)
        rows = []
        for room in sorted(os.listdir(self.root)):
            p = os.path.join(self.root, room, f"{self.metric}.csv")
            if not os.path.isfile(p):
                continue
            lines = self._complete_lines(p)
            hi = len(lines) if bound is None else bound.get(room, 0)
            for line in lines[consumed.get(room, 0): hi]:
                if line.strip():
                    rows.append(self._parse(line, room))
            consumed[room] = hi
        return rows, {"consumed": consumed}

    def read(self, start):
        rows, end = self._rows_slice(start["consumed"], None)
        return (iter(rows), end)

    def readBetweenOffsets(self, start, end):
        """Restart recovery: re-derive the rows of a batch whose offsets
        were committed but whose prefetch cache is gone (crash between
        the offset-log and commit-log writes). Bounded by the END
        offset's line counts, not the live file length, so lines
        appended after the crash are not leaked into the replayed
        batch."""
        rows, _ = self._rows_slice(start["consumed"], end["consumed"])
        return iter(rows)

    def commit(self, end):
        pass  # offsets live in the checkpoint's offset log


class SensorTreeDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "sensor_tree"

    def schema(self) -> str:
        metric = self.options.get("metric", "value")
        return f"timestamp double, {metric} double, room string"

    def _root(self) -> str:
        root = self.options.get("path")
        if not root:
            raise ValueError("sensor_tree requires .option('path', <root>)")
        return root

    def reader(self, schema) -> SensorTreeReader:
        return SensorTreeReader(
            self._root(), self.options.get("metric", "value")
        )

    def simpleStreamReader(self, schema) -> SensorTreeStreamReader:
        return SensorTreeStreamReader(
            self._root(), self.options.get("metric", "value")
        )
