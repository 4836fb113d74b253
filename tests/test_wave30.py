"""Invariant tests for the round-4 wave-30 faces — linear-counting
arithmetic against a brute-force bitmap, Efraimidis–Spirakis sample
membership against a pure-Python replay, and stream≡batch equality
for the Python Data Source streaming reader, at sf0.001."""

from __future__ import annotations

import hashlib
import math

from pyspark.sql import functions as F

from dbpedia_spotlight_db_spark.queries import qfeat, qsketch
from dbpedia_spotlight_db_spark.queries.common import t

SF = "/root/testdata/sf0.001"


def _md5_32(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:8], 16)


def test_lincount_matches_bruteforce_bitmap(spark):
    row = qsketch.Q["agg_lincount"](spark, SF).collect()[0]
    docs = t(spark, SF, "documents").select("text").toPandas()
    vocab = set()
    for txt in docs["text"]:
        for tk in (txt or "").split(" "):
            if tk:
                vocab.add(tk)
    occ = {_md5_32(tk) % 1024 for tk in vocab}
    assert row["true_distinct"] == len(vocab)
    assert row["occupied"] == len(occ)
    est = -1024.0 * math.log((1024.0 - len(occ)) / 1024.0)
    assert abs(row["lc_est"] - est) < 1e-5
    # linear counting at this load factor should land within ~15%
    assert abs(row["lc_est"] - len(vocab)) / len(vocab) < 0.15


def test_weighted_sample_matches_pure_python_replay(spark):
    rows = qfeat.Q["sample_weighted"](spark, SF).toPandas()
    assert list(rows["rnk"]) == sorted(rows["rnk"]) and len(rows) == 20
    docs = (
        t(spark, SF, "documents")
        .select("doc_id", "n_chars")
        .toPandas()
    )
    keys = []
    for _, r in docs.iterrows():
        if r.n_chars <= 0:
            continue
        u = (_md5_32(str(r.doc_id)) + 1) / 4294967296.0
        key = round(1e12 * math.log(u) / float(r.n_chars))
        keys.append((key, r.doc_id))
    want = [
        d for _, d in sorted(keys, key=lambda kv: (-kv[0], kv[1]))[:20]
    ]
    assert list(rows.sort_values("rnk")["doc_id"]) == want
    # weighting sanity: the drawn docs skew long
    assert rows["n_chars"].mean() > docs["n_chars"].mean()


def test_nt_stream_reader_equals_batch_reader(spark, tmp_path):
    """The streaming offset path must yield exactly the batch scan's
    triple multiset, with one input partition per file."""
    from dbpedia_spotlight_db_spark.sources import nt_datasource

    d = tmp_path / "nt"
    d.mkdir()
    for i in range(3):
        (d / f"part-{i}.nt").write_text(
            f"<http://doc/{i}> <http://p/m> <http://e/{i}> .\n"
            f"<http://doc/{i}> <http://p/m> <http://e/shared> .\n"
        )
    nt_datasource.register(spark)
    batch = spark.read.format("ntriples").load(str(d))
    name = "nt_stream_eq_batch"
    import os

    q = (
        spark.readStream.format("ntriples")
        .load(str(d))
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .option("checkpointLocation", os.path.join(str(tmp_path), "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    streamed = spark.table(name)
    assert sorted(map(tuple, streamed.collect())) == sorted(
        map(tuple, batch.collect())
    )
    assert streamed.count() == 6
    # offset arithmetic: the reader fans out one partition per file
    r = nt_datasource.NTriplesStreamReader({"path": str(d)})
    assert r.initialOffset() == {"idx": 0}
    assert r.latestOffset() == {"idx": 3}
    parts = r.partitions({"idx": 0}, {"idx": 3})
    assert len(parts) == 3
    mid = r.partitions({"idx": 1}, {"idx": 2})
    assert len(mid) == 1 and mid[0].value.endswith("part-1.nt")


def test_weighted_sample_plan_is_topk_not_global_sort(spark):
    plan = (
        qfeat.Q["sample_weighted"](spark, SF)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "TakeOrderedAndProject" in plan