"""Custom Python DataSource (Spark 4 datasource API) for gold-set JSONL.

The reference loads gold sets driver-side (eval_api.py:22-48 reads the
whole file into pandas). This source makes the same format a first-class,
PARTITIONED Spark scan: `spark.read.format("goldset").load(dir_or_file)`
splits the file list across input partitions, so a 10M-question gold set
(the 100 TB-era eval regime) reads in parallel instead of through one
driver process — while byte-identical files produce the same rows as
`sources.reader.load_gold` (parity-tested).

Format contract per line: a JSON object with case-insensitive
``question``/``expected_id`` keys; values str-trimmed; rows with either
field empty are dropped (the reference's cleaning rules).

This is the Python DataSource V2 API (SPARK-44076, public since 4.0):
the reader runs on EXECUTORS, one InputPartition per file.
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition
from pyspark.sql.types import StringType, StructField, StructType

GOLD_SCHEMA = StructType(
    [
        StructField("question", StringType(), True),
        StructField("expected_id", StringType(), True),
    ]
)


@dataclass
class _FilePartition(InputPartition):
    path: str


def _iter_gold_rows(path: str):
    with open(path, "r", encoding="utf-8") as fh:
        for line in fh:
            line = line.strip()
            if not line:
                continue
            obj = json.loads(line)
            lower = {str(k).lower().strip(): v for k, v in obj.items()}
            # value cleaning must match sources.reader.load_gold, which
            # uses F.trim — SPACE characters only. Python's bare strip()
            # also removes tabs/newlines and would silently desync the
            # two loaders on padded values.
            q = str(lower.get("question", "") or "").strip(" ")
            e = str(lower.get("expected_id", "") or "").strip(" ")
            if q and e:
                yield (q, e)


class GoldSetReader(DataSourceReader):
    def __init__(self, options):
        self._path = options.get("path")
        if not self._path:
            raise ValueError("goldset source requires a path")

    def partitions(self):
        p = self._path
        if os.path.isdir(p):
            files = sorted(
                os.path.join(p, f)
                for f in os.listdir(p)
                if f.endswith((".jsonl", ".json")) and not f.startswith(("_", "."))
            )
        else:
            files = [p]
        if not files:
            raise ValueError(f"no gold files under {p}")
        return [_FilePartition(f) for f in files]

    def read(self, partition: _FilePartition):
        yield from _iter_gold_rows(partition.path)


class GoldSetDataSource(DataSource):
    """`spark.read.format("goldset")` — register with
    `spark.dataSource.register(GoldSetDataSource)`."""

    @classmethod
    def name(cls) -> str:
        return "goldset"

    def schema(self):
        return GOLD_SCHEMA

    def reader(self, schema):
        return GoldSetReader(self.options)


def register(spark) -> None:
    spark.dataSource.register(GoldSetDataSource)
