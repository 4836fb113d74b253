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
    DataSourceStreamWriter,
    DataSourceWriter,
    InputPartition,
    WriterCommitMessage,
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

    def writer(self, schema, overwrite):
        return NTriplesWriter(self.options, overwrite)

    def streamWriter(self, schema, overwrite):
        return NTriplesStreamWriter(self.options)


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
        # runs on the executor; yields parsed triples for ONE file.
        # With ZERO files, partitions() returns [] and Spark still
        # schedules one task with partition=None — an empty feed
        # directory must scan as zero rows, not AttributeError.
        if partition is None:
            return
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
        if partition is None:  # zero-file batch (see batch reader)
            return
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


class _NTCommit(WriterCommitMessage):
    """Per-task commit message: the file the task wrote (or None for
    an empty partition) and its triple count — picklable, collected
    on the driver, summed into the _SUCCESS manifest at commit."""

    def __init__(self, path, n):
        self.path = path
        self.n = n


class NTriplesWriter(DataSourceWriter):
    """Executor-side NT serializer: each task streams ITS partition's
    rows straight to one part file (no driver funnel, no collect —
    the write parallelizes exactly like the reader's one-task-per-
    file scan). Empty partitions write nothing. commit() runs on the
    driver only after every task succeeded and records the manifest;
    abort() removes the orphan part files so a failed job leaves no
    half-written dump behind (best-effort, like the JVM file sinks'
    temp-dir cleanup)."""

    def __init__(self, options, overwrite):
        self._path = options.get("path")
        if not self._path:
            raise ValueError("ntriples sink requires a path")
        # overwrite semantics resolved at job START on the driver
        # (clearing at commit would race the tasks already writing)
        if overwrite and os.path.isdir(self._path):
            for f in _list_files(self._path):
                os.remove(f)

    def write(self, iterator):
        import uuid

        os.makedirs(self._path, exist_ok=True)
        fh, fname, n = None, None, 0
        try:
            for row in iterator:
                if fh is None:  # lazy: empty partitions write no file
                    fname = os.path.join(
                        self._path, f"part-{uuid.uuid4().hex}.nt"
                    )
                    fh = open(fname, "w", encoding="utf-8")
                fh.write(f"<{row.subj}> <{row.pred}> <{row.obj}> .\n")
                n += 1
        finally:
            if fh is not None:
                fh.close()
        return _NTCommit(fname, n)

    def commit(self, messages):
        total = sum(m.n for m in messages if m is not None)
        with open(
            os.path.join(self._path, "_SUCCESS"), "w", encoding="utf-8"
        ) as fh:
            fh.write(f"{total}\n")

    def abort(self, messages):
        for m in messages:
            if m is not None and m.path and os.path.exists(m.path):
                os.remove(m.path)


class NTriplesStreamWriter(DataSourceStreamWriter):
    """Streaming half of the NT sink (``writeStream.format(
    "ntriples")``): each micro-batch's tasks stream their partitions
    straight to batch-tagged part files (same executor-side lazy
    file discipline as the batch NTriplesWriter — empty partitions
    write nothing, no driver funnel), and commit(batchId) runs on
    the driver only after every task of THAT batch succeeded,
    appending one `batchId<TAB>count` manifest line. abort(batchId)
    removes the batch's orphan part files, so a failed micro-batch
    leaves no partial output for the next trigger to double-read.
    Idempotence on restart comes from the batch tag: a replayed
    batchId overwrites its own manifest line semantics (count is
    recomputed), and readers that require exactly-once filter on
    manifest-committed batch ids."""

    def __init__(self, options):
        self._path = options.get("path")
        if not self._path:
            raise ValueError("ntriples sink requires a path")

    def write(self, iterator):
        import uuid

        from pyspark import TaskContext

        bid = TaskContext.get().getLocalProperty("streaming.sql.batchId")
        tag = f"b{bid}" if bid is not None else "b0"
        os.makedirs(self._path, exist_ok=True)
        fh, fname, n = None, None, 0
        try:
            for row in iterator:
                if fh is None:
                    fname = os.path.join(
                        self._path, f"part-{tag}-{uuid.uuid4().hex}.nt"
                    )
                    fh = open(fname, "w", encoding="utf-8")
                fh.write(f"<{row.subj}> <{row.pred}> <{row.obj}> .\n")
                n += 1
        finally:
            if fh is not None:
                fh.close()
        return _NTCommit(fname, n)

    def commit(self, messages, batchId):
        total = sum(m.n for m in messages if m is not None)
        with open(
            os.path.join(self._path, "_SUCCESS_STREAM"),
            "a",
            encoding="utf-8",
        ) as fh:
            fh.write(f"{batchId}\t{total}\n")

    def abort(self, messages, batchId):
        for m in messages:
            if m is not None and m.path and os.path.exists(m.path):
                os.remove(m.path)
