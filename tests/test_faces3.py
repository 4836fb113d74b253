"""Invariant tests for the third round-3 breadth wave (graph BFS /
label propagation, quality gate, host blocklist, inverted index)
and the fourth (funnel, retention cohorts, BPE-ish token count).

Spark-vs-DuckDB value equality is the oracle gate's job
(tools/check_oracle.py); these pin the semantics the hash compare
can't articulate: BFS level soundness, LPA = 2-hop min, rule-label
consistency, blocklist soundness, posting-list ordering.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from dbpedia_spotlight_db_spark.queries import qcorpus, qpipe

SF = "/root/testdata/sf0.001"


def test_shortest_path_levels_are_bfs_sound(spark):
    got = qpipe.Q["kg_shortest_path"](spark, SF)
    rows = {r.uri: r.dist for r in got.collect()}
    e = qpipe._undirected_edges(spark, SF)
    adj = {}
    for r in e.collect():
        adj.setdefault(r.src, set()).add(r.dst)
    seed = min(
        r.uri for r in qpipe._doc_entities(spark, SF).select("uri").distinct().collect()
    )
    assert rows[seed] == 0
    assert all(0 <= d <= 3 for d in rows.values())
    # every node at dist d >= 1 has a neighbor at dist d - 1
    for uri, d in rows.items():
        if d >= 1:
            assert any(rows.get(n) == d - 1 for n in adj.get(uri, ())), uri
    # no reachable-within-3 node is missing
    frontier, seen = {seed}, {seed}
    for _ in range(3):
        frontier = {n for u in frontier for n in adj.get(u, ())} - seen
        seen |= frontier
    assert seen == set(rows)


def test_labelprop_is_two_hop_min(spark):
    got = {r.uri: r.community for r in qpipe.Q["kg_labelprop"](spark, SF).collect()}
    e = qpipe._undirected_edges(spark, SF)
    adj = {}
    for r in e.collect():
        adj.setdefault(r.src, set()).add(r.dst)
    nodes = set(
        r.uri for r in qpipe._doc_entities(spark, SF).select("uri").distinct().collect()
    )
    assert set(got) == nodes
    for u in nodes:
        hood = {u} | adj.get(u, set())
        hood |= {w for v in adj.get(u, set()) for w in adj.get(v, set())}
        assert got[u] == min(hood), u
    # labels only ever move down toward the component min
    assert all(got[u] <= u for u in nodes)


def test_quality_gate_labels_match_signals(spark):
    got = qcorpus.Q["quality_gate"](spark, SF)
    rules = {"min_words", "max_words", "word_len", "stopwords", "digits", "long_token"}
    for r in got.collect():
        failed = set(r.failed.split(",")) if r.failed else set()
        assert failed <= rules, r.failed
        assert r.keep == (r.failed == "")
        if "min_words" in failed:
            assert r.n_words < 5
        if r.n_words < 5:
            assert "min_words" in failed
    # the gate is a map-only plan: no exchange anywhere
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_host_blocklist_sound(spark):
    got = qcorpus.Q["host_blocklist"](spark, SF)
    hosts = {r.host for r in got.select("host").distinct().collect()}
    assert not hosts & set(qcorpus._BL_LITERAL_HOSTS)
    d = spark.read.parquet(f"{SF}/documents.parquet").select(
        (F.col("doc_id") % 53).alias("h"), "n_chars"
    )
    g = d.agg(F.sum("n_chars").alias("s"), F.count(F.lit(1)).alias("n")).first()
    per = {
        f"h{r.h}.example.org": (r.s, r.n)
        for r in d.groupBy("h").agg(
            F.sum("n_chars").alias("s"), F.count(F.lit(1)).alias("n")
        ).collect()
    }
    for h in hosts:
        s, n = per[h]
        assert s * g.n >= g.s * n, f"{h} is below corpus-mean length but survived"
    # every surviving host keeps ALL its docs (filter is host-granular)
    kept = {r.host: r.cnt for r in got.groupBy("host").agg(F.count(F.lit(1)).alias("cnt")).collect()}
    for h, c in kept.items():
        assert c == per[h][1]


def test_index_postings_ordered_and_capped(spark):
    got = qcorpus.Q["index_postings"](spark, SF).collect()
    assert got
    for r in got:
        entries = [p.split(":") for p in r.postings.split(",")]
        assert 1 <= len(entries) <= qcorpus._POSTINGS_K
        assert r.df >= len(entries)
        tfs = [int(tf) for _, tf in entries]
        docs = [int(d) for d, _ in entries]
        # impact order: tf desc, doc_id asc tie-break
        assert tfs == sorted(tfs, reverse=True)
        for i in range(len(entries) - 1):
            if tfs[i] == tfs[i + 1]:
                assert docs[i] < docs[i + 1]


def test_events_funnel_matches_imperative_replay(spark):
    from dbpedia_spotlight_db_spark.queries import qrel

    got = {r.user_id: r.stage for r in qrel.Q["events_funnel"](spark, SF).collect()}
    ev = sorted(
        spark.read.parquet(f"{SF}/events.parquet").collect(),
        key=lambda r: (r.user_id, r.ts),
    )
    byuser = {}
    for r in ev:
        byuser.setdefault(r.user_id, []).append((r.ts, r.event_type))
    want = {}
    for u, rows in byuser.items():
        t1 = min((ts for ts, k in rows if k == "view"), default=None)
        if t1 is None:
            continue
        t2 = min((ts for ts, k in rows if k == "click" and ts > t1), default=None)
        t3 = (
            min((ts for ts, k in rows if k == "purchase" and ts > t2), default=None)
            if t2 is not None
            else None
        )
        want[u] = 1 + (t2 is not None) + (t3 is not None)
    assert got == want


def test_retention_cohorts_week_zero_equals_cohort_size(spark):
    from pyspark.sql import functions as F
    from dbpedia_spotlight_db_spark.queries import qrel

    got = qrel.Q["retention_cohorts"](spark, SF)
    rows = got.collect()
    assert all(r.week_offset >= 0 and r.cohort_week >= 0 for r in rows)
    # every user is active in their own first week
    e = spark.read.parquet(f"{SF}/events.parquet")
    f = e.groupBy("user_id").agg(F.min(F.to_date("ts")).alias("first_day"))
    sizes = {
        r.cohort_week: r.n
        for r in f.groupBy(
            F.floor(F.datediff("first_day", F.lit("2024-01-01")) / 7)
            .cast("int")
            .alias("cohort_week")
        )
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    zero = {r.cohort_week: r.n_users for r in rows if r.week_offset == 0}
    assert zero == sizes


def test_bpe_pretokenizer_hand_checked(spark):
    from pyspark.sql import functions as F
    from dbpedia_spotlight_db_spark.queries.qdata import _BPE_RE

    cases = [
        ("don't stop 123 foo-bar!!", 8),   # don|'t| stop| 123| foo|-|bar|!!
        ("hello world", 2),
        ("a1b2", 4),
        ("...", 1),
        ("x 42", 2),
    ]
    df = spark.createDataFrame(cases, ["text", "want"])
    got = df.select(
        "want", F.regexp_count("text", F.lit(_BPE_RE)).alias("n")
    ).collect()
    for r in got:
        assert r.n == r.want, r
    # subword pieces can never be fewer than whitespace words
    from dbpedia_spotlight_db_spark.queries import qdata

    t = qdata.Q["text_token_bpe"](spark, SF)
    assert t.filter(F.col("n_bpe") < F.col("n_ws")).count() == 0


def test_nt_export_roundtrips_through_the_nt_source(spark, tmp_path):
    """Sink/source inverse pair: kg_export_nt lines parsed back by
    S3's read_nt_triples reproduce the exact triple set."""
    from dbpedia_spotlight_db_spark.queries.qpipe import _NT_PREFIX, kg_annotate_prior
    from dbpedia_spotlight_db_spark.sources.catalog import read_nt_triples

    lines = qpipe.Q["kg_export_nt"](spark, SF)
    out = str(tmp_path / "triples_nt")
    lines.write.text(out)
    back = read_nt_triples(spark, out)
    got = {(r.subj, r.pred, r.obj) for r in back.collect()}
    want = {
        (
            f"http://doc/{r.doc_id}",
            "http://dbpedia.org/ontology/mentions",
            _NT_PREFIX + r.uri[4:],
        )
        for r in kg_annotate_prior(spark, SF).select("doc_id", "uri").distinct().collect()
    }
    assert got == want and got


def test_snapshot_diff_statuses_are_sound(spark):
    from pyspark.sql import functions as F

    got = qcorpus.Q["snapshot_diff"](spark, SF)
    rows = got.collect()
    assert {r.status for r in rows} <= {"added", "removed", "changed", "same"}
    # one row per key in either snapshot window
    e = spark.read.parquet(f"{SF}/events.parquet")
    keys = (
        e.select("user_id", "event_type").distinct().count()
    )
    assert len(rows) <= keys
    assert len({(r.user_id, r.event_type) for r in rows}) == len(rows)
    # replay one key imperatively
    import datetime

    cut_a = datetime.datetime(2024, 1, 21)
    cut_b = datetime.datetime(2024, 1, 11)
    ev = e.collect()
    r0 = rows[0]
    mine = [
        x for x in ev
        if x.user_id == r0.user_id and x.event_type == r0.event_type
    ]
    la = max(
        ((x.ts, x.event_id) for x in mine if x.ts < cut_a), default=None
    )
    lb = max(
        ((x.ts, x.event_id) for x in mine if x.ts >= cut_b), default=None
    )
    if la is None:
        assert r0.status == "added"
    elif lb is None:
        assert r0.status == "removed"
    elif la[1] == lb[1]:
        assert r0.status == "same"
    else:
        assert r0.status == "changed"
