"""Filter-pushdown-capable Python Data Source (Spark 4.1
``DataSourceReader.pushFilters``) — the missing quadrant of the PyDS
surface (batch/stream read/write all have faces; this is the
SCALE-MECHANISM quadrant: the source itself prunes, the way a
database / REST / GraphQL feed connector must at 100 TB, because
shipping every row to Spark and filtering after the fetch is the
whole cost).

The source synthesizes a deterministic integer feed — ``id`` in
[0, n), ``cents = id * 7``, ``pid = id div rows-per-part`` — split
into contiguous range partitions. ``pushFilters`` accepts
``GreaterThanOrEqual``/``GreaterThan``/``LessThan``/``LessThanOrEqual``
/``EqualTo`` bounds on ``id`` (everything else is returned to Spark as
a residual), ``partitions()`` then drops whole ranges outside the
accepted bounds (partition pruning), and ``read()`` applies the exact
bound row-wise (row pruning). The contract's two halves are separately
testable: planning calls pushFilters ON THE DRIVER and the mutated
reader's partitions() shrinks (pinned by unit test), and the executed
plan's residual Filter no longer contains the accepted predicate
(pinned by the explain audit). Accepting a filter and then failing to
apply it in read() is the one silent-corruption mode — the DuckDB twin
over the same closed-form feed hash-fails in that case, which is why
the face exists.
"""

from __future__ import annotations

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    EqualTo,
    GreaterThan,
    GreaterThanOrEqual,
    InputPartition,
    LessThan,
    LessThanOrEqual,
)


class PushdownIntsSource(DataSource):
    """spark.read.format("pushdown_ints").option("n", N).option("parts", P)."""

    @classmethod
    def name(cls) -> str:
        return "pushdown_ints"

    def schema(self) -> str:
        return "id bigint, cents bigint, pid int"

    def reader(self, schema):
        return PushdownIntsReader(self.options)


class PushdownIntsReader(DataSourceReader):
    def __init__(self, options):
        self._n = int(options.get("n", 1000))
        self._parts = int(options.get("parts", 4))
        # accepted bounds on id: half-open [lo, hi)
        self._lo = 0
        self._hi = self._n

    def pushFilters(self, filters):
        for f in filters:
            # Spark also pushes shapes without a .value (e.g.
            # IsNotNull) — getattr-guard before the bound logic
            if f.attribute == ("id",) and isinstance(
                getattr(f, "value", None), int
            ):
                if isinstance(f, GreaterThanOrEqual):
                    self._lo = max(self._lo, f.value)
                    continue
                if isinstance(f, GreaterThan):
                    self._lo = max(self._lo, f.value + 1)
                    continue
                if isinstance(f, LessThan):
                    self._hi = min(self._hi, f.value)
                    continue
                if isinstance(f, LessThanOrEqual):
                    self._hi = min(self._hi, f.value + 1)
                    continue
                if isinstance(f, EqualTo):
                    self._lo = max(self._lo, f.value)
                    self._hi = min(self._hi, f.value + 1)
                    continue
            yield f  # residual: Spark evaluates it post-scan

    def _per_part(self) -> int:
        return max(1, (self._n + self._parts - 1) // self._parts)

    def partitions(self):
        # partition PRUNING: drop whole ranges outside [lo, hi)
        pp = self._per_part()
        out = []
        for p in range(self._parts):
            start, end = p * pp, min((p + 1) * pp, self._n)
            if end <= self._lo or start >= self._hi or start >= end:
                continue
            out.append(InputPartition((p, start, end)))
        return out

    def read(self, partition):
        # row pruning: the accepted bound applies exactly; Spark no
        # longer re-checks it (the residual Filter lost the bound),
        # so correctness rests HERE — the twin gate's whole point.
        if partition is None:
            return
        p, start, end = partition.value
        pp = self._per_part()
        assert p == start // pp
        for i in range(max(start, self._lo), min(end, self._hi)):
            yield (i, i * 7, p)


def register(spark) -> None:
    try:
        spark.dataSource.register(PushdownIntsSource)
    except Exception as e:  # pragma: no cover - double registration only
        if "already" not in str(e).lower():
            raise
