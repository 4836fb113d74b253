"""S3 alternate path: an N-Triples reader built on Spark 4's PYTHON
DATA SOURCE API (`pyspark.sql.datasource`) — the extension point for
formats Spark has no built-in reader for. The JVM-regex
`catalog.read_nt_triples` remains the production path (no Python in
the hot loop); this source exists because a real crawl lake always
has one feed nobody wrote a JVM connector for, and the API's
contract — schema(), file-grained InputPartitions, a per-partition
record iterator running ON THE EXECUTORS — is exactly how such feeds
scale: one task per file, no driver-side parsing, no collect.

`queries/qlake.pyds_nt_source` proves the two paths agree on the
hash gate; `tests/test_pyds.py` pins partition granularity.
"""

from __future__ import annotations

import glob
import os
import re

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    InputPartition,
)

_NT_PAT = re.compile(r"^<([^>]+)>\s+<([^>]+)>\s+<?([^>\s]+)>?\s*\.?\s*$")


class NTriplesDataSource(DataSource):
    """spark.read.format("ntriples").load(dir_or_file)."""

    @classmethod
    def name(cls) -> str:
        return "ntriples"

    def schema(self) -> str:
        return "subj string, pred string, obj string"

    def reader(self, schema):
        return NTriplesReader(self.options)

    def streamReader(self, schema):
        return NTriplesStreamReader(self.options)


class NTriplesReader(DataSourceReader):
    def __init__(self, options):
        self._path = options.get("path")
        if not self._path:
            raise ValueError("ntriples source requires a path")

    def partitions(self):
        # one InputPartition per data file: the scan parallelizes at
        # file granularity exactly like a text/parquet scan; only the
        # (tiny) file LIST is driver-side, never the content
        return [InputPartition(f) for f in _list_files(self._path)]

    def read(self, partition):
        # runs on the executor; yields parsed triples for ONE file
        yield from _parse_file(partition.value)


def _parse_file(path):
    """Executor-side parse loop for ONE file — shared by the batch and
    streaming readers so both paths have byte-identical semantics."""
    with open(path, "r", encoding="utf-8") as fh:
        for line in fh:
            m = _NT_PAT.match(line.strip())
            if m:
                yield (m.group(1), m.group(2), m.group(3))


def _list_files(path):
    if os.path.isdir(path):
        return sorted(
            f
            for f in glob.glob(os.path.join(path, "*"))
            if os.path.isfile(f)
            and not os.path.basename(f).startswith((".", "_"))
        )
    return [path]


class NTriplesStreamReader(DataSourceStreamReader):
    """STREAMING flavor of the same source — the full
    ``DataSourceStreamReader`` contract (NOT the driver-side
    SimpleDataSourceStreamReader): offsets are positions in the
    sorted file listing, each micro-batch's ``partitions(start, end)``
    is one InputPartition PER NEW FILE, and ``read`` runs the shared
    parse loop ON THE EXECUTORS — so an NT feed directory that grows
    over time is consumed incrementally with the same per-file
    parallelism as the batch scan, and only the (tiny) file LIST ever
    touches the driver. Exactly-once comes from Spark's offset log:
    a replayed batch re-lists the same [start, end) file slice
    (the sink directory is append-only by convention, like any file
    stream source)."""

    def __init__(self, options):
        self._path = options.get("path")
        if not self._path:
            raise ValueError("ntriples stream source requires a path")

    def initialOffset(self):
        return {"idx": 0}

    def latestOffset(self):
        return {"idx": len(_list_files(self._path))}

    def partitions(self, start, end):
        files = _list_files(self._path)
        return [InputPartition(f) for f in files[start["idx"] : end["idx"]]]

    def commit(self, end):
        pass  # offsets live in Spark's checkpoint log; nothing to ack

    def read(self, partition):
        yield from _parse_file(partition.value)


def register(spark) -> None:
    """Idempotent registration of the format name. Only the
    duplicate-registration case is swallowed — a genuine failure
    (API missing, serialization error) must surface here, not as an
    unrelated DATA_SOURCE_NOT_FOUND at read time."""
    try:
        spark.dataSource.register(NTriplesDataSource)
    except Exception as e:
        msg = str(e).lower()
        if "already" in msg or "exists" in msg or "duplicate" in msg:
            return
        raise
