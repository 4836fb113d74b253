"""Wave-121 invariants: pathGlobFilter provably never lists the
planted junk (and a filterless read of the same dir ERRORS on the
garbage bytes — the cost the option avoids); the one-sample KS
matches the exact cross-multiplied replay and certifies md5
uniformity on the fixture."""

from __future__ import annotations

import hashlib
from collections import Counter

import pytest

from dbpedia_spotlight_db_spark.queries import qio, qstats
from dbpedia_spotlight_db_spark.queries.common import t

SF = "/root/testdata/sf0.001"


def test_path_glob_filter_excludes_junk(spark):
    rows = qio.Q["scan_path_glob_filter"](spark, SF).collect()
    assert rows and all(r["junk_excluded"] for r in rows)
    exp = Counter()
    sums = Counter()
    for r in t(spark, SF, "documents").collect():
        exp[r["lang"]] += 1
        sums[r["lang"]] += r["doc_id"]
    assert {r["lang"]: (r["n_docs"], r["id_sum"]) for r in rows} == {
        k: (exp[k], sums[k]) for k in exp
    }


def test_unfiltered_read_chokes_on_junk(spark, tmp_path):
    import pyspark.sql.functions as F

    d = tmp_path / "mixed"
    d.mkdir()
    t(spark, SF, "documents").select("doc_id").coalesce(1).write.mode(
        "overwrite"
    ).parquet(str(d / "ok"))
    import glob as g
    import shutil

    part = g.glob(str(d / "ok" / "part-*.parquet"))[0]
    shutil.copy(part, str(d / "data.parquet"))
    (d / "spill.tmp").write_bytes(b"\xffnot-parquet\x00" * 32)
    with pytest.raises(Exception):
        spark.read.schema("doc_id long").parquet(str(d)).filter(
            F.col("doc_id") >= 0
        ).count()


def test_ks_uniform_matches_replay(spark):
    cnt = Counter()
    for r in t(spark, SF, "documents").collect():
        bk = int(
            hashlib.md5(str(r["doc_id"]).encode()).hexdigest()[:2], 16
        )
        cnt[bk] += 1
    n = sum(cnt.values())
    k = 0
    dmax = 0
    for bk in sorted(cnt):
        c = cnt[bk]
        k += c
        dmax = max(
            dmax,
            abs(256 * k - n * (bk + 1)),
            abs(256 * (k - c) - n * bk),
        )
    got = qstats.Q["stat_ks_uniform"](spark, SF).collect()[0]
    assert (got["n"], got["d_num"]) == (n, dmax)
    assert abs(got["ks_stat"] - round(dmax / (256.0 * n), 6)) <= 1e-9
    assert got["uniform_ok"] is True, "md5 first byte must be uniform"
