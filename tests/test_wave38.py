"""Wave-38 invariants: STL anomaly flags recomputed driver-side,
fertility recounts, and the Python data-source WRITER round trip
(lazy part files, _SUCCESS manifest, empty partitions)."""

from __future__ import annotations

import glob
import os

from pyspark.sql import functions as F

from dbpedia_spotlight_db_spark.queries import qcorpus, qstats
from dbpedia_spotlight_db_spark.queries.common import t
from dbpedia_spotlight_db_spark.sources import nt_datasource

SF = "/root/testdata/sf0.001"


def test_anomaly_flags_match_driver_recount(spark):
    stl = {r["day"]: r for r in qstats.Q["events_seasonal"](spark, SF).collect()}
    res = sorted(
        r["residual"] for r in stl.values() if r["residual"] is not None
    )

    def type7_median(xs):
        n = len(xs)
        mid = (n - 1) / 2
        lo, hi = xs[int(mid)], xs[int(mid + 0.5)]
        return (lo + hi) / 2

    med = type7_median(res)
    mad = type7_median(sorted(abs(x - med) for x in res))
    want = {
        day
        for day, r in stl.items()
        if r["residual"] is not None
        and mad > 0
        and round(abs(r["residual"] - med) / mad, 6) > 3.0
    }
    got = {r["day"] for r in qstats.Q["events_anomaly_stl"](spark, SF).collect()}
    assert got == want


def test_fertility_recounts(spark):
    rows = {r["lang"]: r for r in qcorpus.Q["text_fertility"](spark, SF).collect()}
    docs = t(spark, SF, "documents").select("lang", "text", "n_chars").collect()
    langs = {d["lang"] for d in docs}
    assert set(rows) == langs
    for lang in langs:
        sub = [d for d in docs if d["lang"] == lang]
        n_tok = sum(len((d["text"] or "").split(" ")) for d in sub)
        assert rows[lang]["n_docs"] == len(sub)
        assert rows[lang]["n_tokens"] == n_tok
        assert rows[lang]["n_chars"] == sum(d["n_chars"] or 0 for d in sub)
        assert rows[lang]["chars_per_token"] == round(
            rows[lang]["n_chars"] / n_tok, 6
        )


def test_nt_writer_roundtrip_and_manifest(spark, tmp_path):
    nt_datasource.register(spark)
    rows = [(f"doc://{i}", "dbo:mentions", f"dbr:E{i % 7}") for i in range(30)]
    df = spark.createDataFrame(rows, "subj string, pred string, obj string")
    out = str(tmp_path / "nt_out")
    # more partitions than rows: empty partitions must write NO file
    df.repartition(40).write.format("ntriples").mode("overwrite").save(out)
    parts = [
        f
        for f in glob.glob(os.path.join(out, "*"))
        if not os.path.basename(f).startswith(("_", "."))
    ]
    assert 0 < len(parts) <= 30
    with open(os.path.join(out, "_SUCCESS")) as fh:
        assert int(fh.read().strip()) == 30
    back = spark.read.format("ntriples").load(out)
    assert sorted(map(tuple, back.collect())) == sorted(rows)
    # overwrite clears the previous generation instead of appending
    df.limit(5).repartition(2).write.format("ntriples").mode(
        "overwrite"
    ).save(out)
    again = spark.read.format("ntriples").load(out)
    assert again.count() == 5
