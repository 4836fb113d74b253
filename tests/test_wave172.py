"""Wave-172 invariants: attribute assortativity replays from the
pair list through the exact mixing-matrix integers (and the shared-
vocabulary fixture keeps r well below 1); QUALIFY's translation
keeps exactly the per-type top-3 with WindowGroupLimit, and Spark
really does reject the QUALIFY keyword."""

from __future__ import annotations

from collections import Counter, defaultdict

from dbpedia_spotlight_db_spark.queries import qdata, qsql
from dbpedia_spotlight_db_spark.queries.common import t

SF = "/root/testdata/sf0.001"


def test_attr_assortativity_matches_replay(spark):
    lang = {
        r["doc_id"]: r["lang"]
        for r in t(spark, SF, "documents").collect()
    }
    pairs = [
        (r["id_a"], r["id_b"])
        for r in qdata.Q["dedup_jaccard"](spark, SF).collect()
    ]
    mm = Counter()
    for a, b in pairs:
        mm[(lang[a], lang[b])] += 1
        mm[(lang[b], lang[a])] += 1
    m = sum(mm.values())
    diag = sum(c for (x, y), c in mm.items() if x == y)
    rows = Counter()
    for (x, _), c in mm.items():
        rows[x] += c
    srow2 = sum(v * v for v in rows.values())
    got = qdata.Q["kg_attr_assortativity"](spark, SF).collect()[0]
    assert (got["n_edge_ends"], got["n_same_lang_ends"], got["srow2"]) == (
        m, diag, srow2,
    )
    r = (m * diag - srow2) / (m * m - srow2)
    assert abs(got["assortativity"] - round(r, 6)) <= 1e-9
    assert -1.0 <= got["assortativity"] < 1.0
    # shared-vocabulary fixture: cross-lang near-dups exist
    assert diag < m


def test_qualify_matches_replay_and_spark_rejects_keyword(spark):
    per = defaultdict(list)
    for r in t(spark, SF, "events").collect():
        if r["value"] is None:
            continue
        per[r["event_type"]].append(
            (-round(r["value"] * 100), r["event_id"])
        )
    want = []
    for ty in sorted(per):
        for nc, eid in sorted(per[ty])[:3]:
            want.append((ty, eid, -nc))
    got = [
        (r["event_type"], r["event_id"], r["cents"])
        for r in qsql.Q["sql_qualify"](spark, SF).collect()
    ]
    assert got == want
    df = qsql.Q["sql_qualify"](spark, SF)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "WindowGroupLimit" in plan
    # the documented gap: Spark does not parse QUALIFY
    import pytest
    from pyspark.errors import ParseException

    t(spark, SF, "events").createOrReplaceTempView("ev_qual_probe")
    with pytest.raises(ParseException):
        spark.sql(
            "SELECT event_id FROM ev_qual_probe "
            "QUALIFY row_number() OVER (ORDER BY event_id) <= 3"
        ).collect()
