"""Custom Python Data Source (Spark 4 DataSource API): a deterministic
synthetic-documents source, batch and streaming.

The reference's only sources are JSON files and catalog tables
(extract.py:30, clean.py:52); this adds the engine's own pluggable
source surface using the modern ``pyspark.sql.datasource`` API — the
supported way to expose a non-file system (an internal service, a
feed, a synthetic generator) as a first-class `spark.read.format(...)`
relation without a JVM connector.

Design for scale:
- the generator is a pure function of (doc_id, seed) — rows never
  depend on partitioning, so the source is deterministic at any
  parallelism (same contract as functions/sampling.py);
- ``partitions()`` splits the id range into ``partitions`` disjoint
  strided slices → Spark schedules one task per slice, so throughput
  scales with executors, not the driver (the driver never materializes
  rows);
- the stream reader (``readStream.format("synthdocs")``) emits
  ``rows_per_batch`` ids per micro-batch from a monotonically
  advancing offset — an offset-tracked source with replayable ranges
  (offset N..M always yields the same rows), which is exactly the
  contract Structured Streaming needs for exactly-once sinks.

Register once per session:  spark.dataSource.register(SynthDocsSource)
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)

SCHEMA = "doc_id bigint, text string, lang string, source string, n_chars bigint"

_LANGS = ("en", "en", "en", "de", "fr", "es", "zh")
_WORDS = (
    "data", "table", "query", "join", "scan", "merge", "batch", "stream",
    "window", "hash", "sort", "filter", "agg", "row", "column", "value",
)


def _doc(doc_id: int, seed: int) -> tuple[int, str, str, str, int]:
    """Deterministic document for (doc_id, seed): same row on every
    engine, partition, and retry."""
    h = hashlib.md5(f"{seed}:{doc_id}".encode()).digest()
    n_words = 20 + h[0] % 40
    words = [
        _WORDS[h[(3 + i) % 16] % len(_WORDS)] for i in range(n_words)
    ]
    text = " ".join(words)
    lang = _LANGS[h[1] % len(_LANGS)]
    source = f"src{h[2] % 8}"
    return doc_id, text, lang, source, len(text)


class _SliceParts(InputPartition):
    def __init__(self, index: int, start: int, end: int, stride: int, seed: int):
        self.index = index
        self.start = start
        self.end = end
        self.stride = stride
        self.seed = seed


class SynthDocsReader(DataSourceReader):
    def __init__(self, options: dict):
        self.n = int(options.get("n", 1000))
        self.num_partitions = int(options.get("partitions", 8))
        self.seed = int(options.get("seed", 42))

    def partitions(self) -> list[InputPartition]:
        return [
            _SliceParts(i, i, self.n, self.num_partitions, self.seed)
            for i in range(self.num_partitions)
        ]

    def read(self, partition: _SliceParts) -> Iterator[tuple]:
        for doc_id in range(partition.start, partition.end, partition.stride):
            yield _doc(doc_id, partition.seed)


class SynthDocsStreamReader(SimpleDataSourceStreamReader):
    """Offset-tracked micro-batch source: offset = next unread doc_id;
    read(start) returns (rows, end) and readBetweenOffsets replays any
    committed range deterministically (exactly-once replay contract)."""

    def __init__(self, options: dict):
        self.rows_per_batch = int(options.get("rows_per_batch", 100))
        self.max_id = int(options.get("n", 1_000_000))
        self.seed = int(options.get("seed", 42))

    def initialOffset(self) -> dict:
        return {"next": 0}

    def read(self, start: dict):
        lo = start["next"]
        hi = min(lo + self.rows_per_batch, self.max_id)
        return self._rows(lo, hi), {"next": hi}

    def readBetweenOffsets(self, start: dict, end: dict):
        return self._rows(start["next"], end["next"])

    def _rows(self, lo: int, hi: int):
        return iter([_doc(i, self.seed) for i in range(lo, hi)])


class SynthDocsSource(DataSource):
    """spark.read.format("synthdocs").option("n", ...).load()"""

    @classmethod
    def name(cls) -> str:
        return "synthdocs"

    def schema(self) -> str:
        return SCHEMA

    def reader(self, schema) -> SynthDocsReader:
        return SynthDocsReader(self.options)

    def simpleStreamReader(self, schema) -> SynthDocsStreamReader:
        return SynthDocsStreamReader(self.options)


def register(spark) -> None:
    spark.dataSource.register(SynthDocsSource)
