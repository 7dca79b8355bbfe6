"""Custom Python Data Source (Spark 4 pyspark.sql.datasource API): a
deterministic synthetic table source with REAL partition planning — each
partition generates its own row range worker-side, proving the parallel
source contract (no driver materialization, no single-task scan).

Public API only; the pattern generalizes to any Python-readable system
(REST pages, object-store listings, custom formats): partitions() returns
the work-list, read(partition) streams that shard's rows.
"""

from __future__ import annotations

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition


class RangePartition(InputPartition):
    def __init__(self, pid: int, start: int, end: int):
        self.pid = pid
        self.start = start
        self.end = end


class SyntheticEventsReader(DataSourceReader):
    def __init__(self, options):
        self.n_rows = int(options.get("n_rows", 1000))
        self.n_parts = int(options.get("n_parts", 8))

    def partitions(self):
        per = self.n_rows // self.n_parts
        parts = []
        for p in range(self.n_parts):
            start = p * per
            end = self.n_rows if p == self.n_parts - 1 else (p + 1) * per
            parts.append(RangePartition(p, start, end))
        return parts

    def read(self, partition):
        # deterministic content: value derived from the row id alone, so
        # every re-read (and every engine) regenerates identical rows
        for i in range(partition.start, partition.end):
            yield (i, partition.pid, (i * 2654435761) % 1000, f"cat_{i % 5}")


class SyntheticEventsSource(DataSource):
    @classmethod
    def name(cls):
        return "synthetic_events"

    def schema(self):
        return "row_id bigint, part_id int, value bigint, category string"

    def reader(self, schema):
        return SyntheticEventsReader(self.options)
