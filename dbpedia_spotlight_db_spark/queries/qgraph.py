"""Graph-construction training-data faces (round-4 wave 34): the
operators that turn the co-occurrence KG into MODEL INPUTS — a
deterministic random-walk corpus (the DeepWalk/node2vec data-prep
step: walks are the "sentences" a graph-embedding model trains on),
hash-corrupted negative edge samples (the contrastive pairs a
link-prediction model needs alongside the positive edges), and a
per-community conductance report (the cut-quality gate on the LPA
communities, complementing kg_modularity's null-model gate).

All three reuse qpipe's shared graph machinery (_doc_entities /
_entity_pairs / _undirected_edges / _lpa_two_rounds and their SQL CTE
twins) so the graph definition can never drift between faces.
"Randomness" is md5-derived everywhere (the sample_hash discipline):
walk steps and corruption targets are identical across engines, runs,
partitionings, and cluster sizes — the property a reproducible
embedding-training pipeline needs from its samplers. Windows run only
over entity-vocabulary-bounded relations (the node list, per-node
neighbor groups), never corpus rows.
"""

from __future__ import annotations

from pyspark.sql import Window, functions as F

from .common import t
from .qpipe import (
    _DICT_SQL,
    _DOCENT_SQL,
    _GRAMS_SQL,
    _LPA_SQL,
    _PAIRS_SQL,
    _UEDGES_SQL,
    _doc_entities,
    _entity_pairs,
    _lpa_two_rounds,
    _undirected_edges,
)

Q = {}
O = {}


def q(name: str, sql: str | None):
    def deco(fn):
        assert name not in Q, f"duplicate query key {name!r}"
        Q[name] = fn
        if sql is not None:
            O[name] = sql
        return fn

    return deco


# ---------------------------------------------------------------------------
# deterministic random-walk corpus — hash-coin next-step selection
# ---------------------------------------------------------------------------
def _step_sql(step: int, cur: str) -> str:
    return f"""
    {cur} AS (
      SELECT src, dst FROM (
        SELECT src, dst,
               ROW_NUMBER() OVER (PARTITION BY src
                                  ORDER BY md5(src || '|{step}|' || dst),
                                           dst) AS rn
        FROM e) w WHERE rn = 1)
"""


@q(
    "kg_walks",
    f"""
    WITH {_GRAMS_SQL},
    {_DOCENT_SQL},
    {_PAIRS_SQL},
    {_UEDGES_SQL},
    {_step_sql(1, "s1")},
    {_step_sql(2, "s2")},
    {_step_sql(3, "s3")}
    SELECT s1.src AS start_uri, s1.dst AS v1, s2.dst AS v2, s3.dst AS v3
    FROM s1
    JOIN s2 ON s2.src = s1.dst
    JOIN s3 ON s3.src = s2.dst
    """,
)
def kg_walks(spark, sf_dir):
    """Random-walk corpus generation (3-step walk from every node)
    — the data-prep step for DeepWalk-style graph embeddings: the
    emitted (start, v1, v2, v3) paths are the "sentences" the
    embedding model trains on. The coin is md5(cur|step|neighbor):
    each step moves to the neighbor with the smallest hash (ties on
    neighbor id — md5 collisions aside, unreachable), so the walk is
    fully deterministic across engines, runs, partitionings, and
    cluster sizes, yet uniform-ish over neighbors like an RNG walk;
    keying the hash on (cur, step) decorrelates consecutive steps.
    Scale shape: each step is ONE row_number window over the
    per-node neighbor groups (partitioned by src — never a global
    sort) producing a |V|-sized successor map, then the walk table
    chains 3 unhinted equi-joins on those maps; nothing ever fans
    out beyond |V| rows per step, and longer walks are the same
    plan unrolled."""
    e = _undirected_edges(spark, sf_dir)

    def _step(step: int):
        h = F.md5(
            F.concat(F.col("src"), F.lit(f"|{step}|"), F.col("dst"))
        )
        w = Window.partitionBy("src").orderBy("h", "dst")
        return (
            e.select("src", "dst", h.alias("h"))
            .withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .select("src", "dst")
        )

    s1, s2, s3 = _step(1).alias("s1"), _step(2).alias("s2"), _step(3).alias("s3")
    return (
        s1.join(s2, F.col("s2.src") == F.col("s1.dst"))
        .join(s3, F.col("s3.src") == F.col("s2.dst"))
        .select(
            F.col("s1.src").alias("start_uri"),
            F.col("s1.dst").alias("v1"),
            F.col("s2.dst").alias("v2"),
            F.col("s3.dst").alias("v3"),
        )
    )


# ---------------------------------------------------------------------------
# negative edge sampling — hash-corrupted tails for link prediction
# ---------------------------------------------------------------------------
@q(
    "kg_negative_sample",
    f"""
    WITH {_GRAMS_SQL},
    {_DOCENT_SQL},
    {_PAIRS_SQL},
    nodes AS (SELECT DISTINCT uri FROM de),
    nvr AS (SELECT COUNT(*) AS nv FROM nodes),
    nn AS (SELECT uri, ROW_NUMBER() OVER (ORDER BY uri) AS rn FROM nodes),
    cand AS (
      SELECT p.uri_a, p.uri_b,
             1 + CAST(('0x' || substr(md5(p.uri_a || '>' || p.uri_b), 1, 8))
                      ::UBIGINT AS BIGINT) % nvr.nv AS idx
      FROM p CROSS JOIN nvr),
    neg0 AS (
      SELECT LEAST(c.uri_a, nn.uri) AS uri_a,
             GREATEST(c.uri_a, nn.uri) AS uri_b
      FROM cand c JOIN nn ON nn.rn = c.idx
      WHERE nn.uri <> c.uri_a AND nn.uri <> c.uri_b),
    neg AS (
      SELECT DISTINCT n.uri_a, n.uri_b FROM neg0 n
      WHERE NOT EXISTS (SELECT 1 FROM p
                        WHERE p.uri_a = n.uri_a AND p.uri_b = n.uri_b))
    SELECT uri_a, uri_b, CAST(1 AS INT) AS label FROM p
    UNION ALL
    SELECT uri_a, uri_b, CAST(0 AS INT) AS label FROM neg
    """,
)
def kg_negative_sample(spark, sf_dir):
    """Contrastive training pairs for link prediction: every positive
    co-occurrence edge, plus one hash-corrupted negative per positive
    — the standard corrupt-the-tail scheme (replace dst with the node
    at index md5(edge) mod |V| in the sorted vocabulary), with the
    corruption verified against the true edge set (anti-join) so no
    "negative" is secretly positive, and self-pairs/identity
    corruptions dropped. md5-derived indices make the negative set
    identical across engines, runs, partitionings, and cluster sizes
    (an RNG sampler would make every training run see different
    negatives — irreproducible evals). Scale shape: the node index is
    ONE row_number window over the entity vocabulary (vocab-bounded,
    the kg_entity_card precedent — never corpus rows); the corrupt
    step is an unhinted equi-join of the edge list against that
    |V|-sized index on the computed idx; the no-false-negative check
    is an unhinted LeftAnti on the normalized pair key. The NOT
    EXISTS spelling lets Catalyst decorrelate to the same LeftAnti
    (the join_exists_subq precedent, audit #43)."""
    p = _entity_pairs(spark, sf_dir)
    nodes = _doc_entities(spark, sf_dir).select("uri").distinct()
    nvr = nodes.agg(F.count(F.lit(1)).alias("nv"))
    nn = nodes.select(
        "uri", F.row_number().over(Window.orderBy("uri")).alias("rn")
    )
    idx = 1 + F.conv(
        F.substring(
            F.md5(F.concat(F.col("uri_a"), F.lit(">"), F.col("uri_b"))),
            1,
            8,
        ),
        16,
        10,
    ).cast("long") % F.col("nv")
    cand = p.crossJoin(F.broadcast(nvr)).select(
        "uri_a", "uri_b", idx.alias("idx")
    )
    neg0 = (
        cand.join(
            nn.select(F.col("uri").alias("nb"), F.col("rn").alias("idx")),
            "idx",
        )
        .filter((F.col("nb") != F.col("uri_a")) & (F.col("nb") != F.col("uri_b")))
        .select(
            F.least("uri_a", "nb").alias("uri_a"),
            F.greatest("uri_a", "nb").alias("uri_b"),
        )
    )
    neg = neg0.distinct().join(p, ["uri_a", "uri_b"], "left_anti")
    pos = p.select("uri_a", "uri_b", F.lit(1).cast("int").alias("label"))
    return pos.unionByName(
        neg.select("uri_a", "uri_b", F.lit(0).cast("int").alias("label"))
    )


# ---------------------------------------------------------------------------
# community conductance — cut quality of the LPA partition
# ---------------------------------------------------------------------------
@q(
    "kg_conductance",
    f"""
    WITH {_GRAMS_SQL},
    {_DOCENT_SQL},
    {_PAIRS_SQL},
    {_UEDGES_SQL},
    {_LPA_SQL},
    deg AS (SELECT src, COUNT(*) AS d FROM e GROUP BY src),
    vols AS (
      SELECT community, n_nodes, vol, SUM(vol) OVER () AS vol_all
      FROM (SELECT l2.community, CAST(COUNT(*) AS BIGINT) AS n_nodes,
                   CAST(SUM(COALESCE(deg.d, 0)) AS BIGINT) AS vol
            FROM l2 LEFT JOIN deg ON deg.src = l2.uri
            GROUP BY l2.community) v),
    lab AS (
      SELECT la.community AS ca, lb.community AS cb
      FROM p
      JOIN l2 la ON la.uri = p.uri_a
      JOIN l2 lb ON lb.uri = p.uri_b),
    cut AS (
      SELECT community, CAST(COUNT(*) AS BIGINT) AS cut FROM (
        SELECT ca AS community FROM lab WHERE ca <> cb
        UNION ALL
        SELECT cb FROM lab WHERE ca <> cb) u
      GROUP BY community)
    SELECT vols.community, vols.n_nodes, vols.vol,
           CAST(COALESCE(cut.cut, 0) AS BIGINT) AS cut,
           CASE WHEN LEAST(vols.vol, vols.vol_all - vols.vol) = 0 THEN NULL
                ELSE round(CAST(COALESCE(cut.cut, 0) AS DOUBLE)
                           / LEAST(vols.vol, vols.vol_all - vols.vol), 6) + 0
           END AS conductance
    FROM vols LEFT JOIN cut ON cut.community = vols.community
    """,
)
def kg_conductance(spark, sf_dir):
    """Per-community conductance for the kg_labelprop partition:
    φ(c) = cut(c) / min(vol(c), vol(G) − vol(c)) — the cut-quality
    gate on community detection (low φ = a real community; pairs
    with kg_modularity, which judges against the random-graph null
    while conductance judges the boundary directly). Reuses the
    exact 2-round LPA assignment via the shared _LPA_SQL /
    _lpa_two_rounds pair so the three community faces can never
    drift. Counting: each cross-community edge credits the cut of
    BOTH its endpoint communities (the 3-corner unpivot credit
    discipline from kg_clustering); vol is the degree sum; vol(G)
    = 2m rides the vols relation as a SUM() OVER () window — never
    a second aggregation branch over the corpus-scale subtree (the
    wave-32 lesson). Exactness: cut/vol/2m are exact integers; the
    single division is round-6 with the LEAST(...) = 0 ANSI
    DIVIDE_BY_ZERO guard (an isolated-community partition) — NULL
    on both engines."""
    e = _undirected_edges(spark, sf_dir)
    p = _entity_pairs(spark, sf_dir)
    nodes = _doc_entities(spark, sf_dir).select("uri").distinct()
    comm = _lpa_two_rounds(e, nodes)
    deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("d"))
    wall = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    vols = (
        comm.join(deg, comm["uri"] == deg["src"], "left")
        .groupBy("community")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_nodes"),
            F.sum(F.coalesce("d", F.lit(0))).cast("long").alias("vol"),
        )
        .withColumn("vol_all", F.sum("vol").over(wall))
    )
    lab = p.join(
        comm.select(F.col("uri").alias("uri_a"), F.col("community").alias("ca")),
        "uri_a",
    ).join(
        comm.select(F.col("uri").alias("uri_b"), F.col("community").alias("cb")),
        "uri_b",
    )
    crossed = lab.filter(F.col("ca") != F.col("cb"))
    cut = (
        crossed.select(F.col("ca").alias("community"))
        .unionByName(crossed.select(F.col("cb").alias("community")))
        .groupBy("community")
        .agg(F.count(F.lit(1)).cast("long").alias("cut"))
    )
    denom = F.least(F.col("vol"), F.col("vol_all") - F.col("vol"))
    return vols.join(cut, "community", "left").select(
        "community",
        "n_nodes",
        "vol",
        F.coalesce("cut", F.lit(0)).cast("long").alias("cut"),
        F.when(denom == 0, F.lit(None).cast("double"))
        .otherwise(
            F.round(
                F.coalesce("cut", F.lit(0)).cast("double") / denom, 6
            )
            + F.lit(0.0)
        )
        .alias("conductance"),
    )


# ---------------------------------------------------------------------------
# VoID-style predicate statistics over the heterogeneous KG
# ---------------------------------------------------------------------------
_VOID_TRIPLES_SQL = f"""
    trip AS (
      SELECT 'doc://' || CAST(doc_id AS VARCHAR) AS subj,
             'dbo:mentions' AS pred, uri AS obj
      FROM de
      UNION ALL
      SELECT uri_a, 'dbo:cooccursWith', uri_b FROM p
      UNION ALL
      SELECT 'doc://' || CAST(doc_id AS VARCHAR), 'dbo:inLanguage',
             'lang:' || lang
      FROM documents
      UNION ALL
      SELECT 'doc://' || CAST(doc_id AS VARCHAR), 'dbo:fromSource',
             'src:' || source
      FROM documents)
"""


@q(
    "kg_void_stats",
    f"""
    WITH {_GRAMS_SQL},
    {_DOCENT_SQL},
    {_PAIRS_SQL},
    {_VOID_TRIPLES_SQL}
    SELECT pred, CAST(COUNT(*) AS BIGINT) AS n_triples,
           CAST(COUNT(DISTINCT subj) AS BIGINT) AS n_subjects,
           CAST(COUNT(DISTINCT obj) AS BIGINT) AS n_objects
    FROM trip GROUP BY pred
    """,
)
def kg_void_stats(spark, sf_dir):
    """VoID-style dataset statistics for the constructed KG: per
    predicate, triple count and distinct subject/object cardinality
    — the partition report a SPARQL engine's query planner (and any
    downstream KG consumer deciding what to join first) reads before
    touching the data; publishing it next to the dump is standard
    Linked-Data practice. The graph here is the heterogeneous union
    the pipeline actually produces: doc-mentions-entity containment,
    entity-cooccursWith-entity relatedness, plus the doc-metadata
    predicates (inLanguage, fromSource). Scale shape: the union is
    scanned once per distinct-cardinality expansion (Spark plans the
    two COUNT DISTINCTs via a single Expand — no self-join), every
    agg is keyed by the handful of predicates, and nothing sorts;
    the output is #predicates rows. Counts are exact integers —
    nothing to round, so engine parity is structural."""
    de = _doc_entities(spark, sf_dir)
    p = _entity_pairs(spark, sf_dir)
    docs = t(spark, sf_dir, "documents")
    doc_subj = F.concat(F.lit("doc://"), F.col("doc_id").cast("string"))
    trip = (
        de.select(
            doc_subj.alias("subj"),
            F.lit("dbo:mentions").alias("pred"),
            F.col("uri").alias("obj"),
        )
        .unionByName(
            p.select(
                F.col("uri_a").alias("subj"),
                F.lit("dbo:cooccursWith").alias("pred"),
                F.col("uri_b").alias("obj"),
            )
        )
        .unionByName(
            docs.select(
                doc_subj.alias("subj"),
                F.lit("dbo:inLanguage").alias("pred"),
                F.concat(F.lit("lang:"), F.col("lang")).alias("obj"),
            )
        )
        .unionByName(
            docs.select(
                doc_subj.alias("subj"),
                F.lit("dbo:fromSource").alias("pred"),
                F.concat(F.lit("src:"), F.col("source")).alias("obj"),
            )
        )
    )
    return trip.groupBy("pred").agg(
        F.count(F.lit(1)).cast("long").alias("n_triples"),
        F.countDistinct("subj").cast("long").alias("n_subjects"),
        F.countDistinct("obj").cast("long").alias("n_objects"),
    )


# ---------------------------------------------------------------------------
# surface-form ambiguity report — disambiguation difficulty
# ---------------------------------------------------------------------------
@q(
    "kg_ambiguity",
    f"""
    WITH {_GRAMS_SQL},
    m AS (
      SELECT g.sf, CAST(COUNT(*) AS BIGINT) AS n_mentions
      FROM grams g
      JOIN (SELECT DISTINCT sf FROM {_DICT_SQL}) dd ON g.sf = dd.sf
      GROUP BY g.sf),
    ent AS (
      SELECT sf, CAST(COUNT(*) AS BIGINT) AS n_candidates,
             CAST(SUM(w) AS BIGINT) AS wt,
             CAST(SUM(CAST(round(1000000.0 * (CAST(w AS DOUBLE)
                                  * ln(CAST(w AS DOUBLE)))) AS BIGINT))
               AS BIGINT) AS swlw_micros
      FROM {_DICT_SQL} GROUP BY sf)
    SELECT e.sf AS surface_form, e.n_candidates,
           CAST(COALESCE(m.n_mentions, 0) AS BIGINT) AS n_mentions,
           round(ln(CAST(e.wt AS DOUBLE))
                 - (CAST(e.swlw_micros AS DOUBLE) / 1000000.0) / e.wt,
                 6) + 0 AS prior_entropy
    FROM ent e LEFT JOIN m ON m.sf = e.sf
    """,
)
def kg_ambiguity(spark, sf_dir):
    """Disambiguation-difficulty report per surface form: candidate
    count, corpus mention frequency, and the Shannon entropy of the
    prior P(e|s) — the triage signal a KG-construction pipeline uses
    to decide where context scoring matters (entropy ≈ 0: the prior
    decides; high entropy + high mentions: route through the full
    disambiguator, and a human-review budget goes here first).
    Entropy via the ln-sum identity H = ln(W) − Σw·ln(w)/W (the
    source_lang_stats precedent) with the per-candidate w·ln(w)
    terms quantized to integer micros before summing, so the
    aggregate is order-independent and engine-exact; the final
    expression divides in identical order, round 6, +0 (a
    single-candidate form has H = exactly 0 — the -0.0 hazard).
    Scale shape: mention counts are ONE corpus-scan map-side agg
    restricted to dictionary keys (the spot_mentions join); the
    entropy side aggregates the dictionary relation itself
    (model-sized, never corpus); the two meet in an sf-keyed join
    with no window over anything unbounded."""
    from .qpipe import _dict_df, _grams_spark

    grams = _grams_spark(spark, sf_dir)
    d = _dict_df(spark)
    m = (
        grams.join(F.broadcast(d.select("sf").distinct()), "sf")
        .groupBy("sf")
        .agg(F.count(F.lit(1)).cast("long").alias("n_mentions"))
    )
    ent = d.groupBy("sf").agg(
        F.count(F.lit(1)).cast("long").alias("n_candidates"),
        F.sum("w").cast("long").alias("wt"),
        F.sum(
            F.round(
                F.lit(1000000.0)
                * (
                    F.col("w").cast("double")
                    * F.log(F.col("w").cast("double"))
                )
            ).cast("long")
        )
        .cast("long")
        .alias("swlw_micros"),
    )
    return ent.join(m, "sf", "left").select(
        F.col("sf").alias("surface_form"),
        "n_candidates",
        F.coalesce("n_mentions", F.lit(0)).cast("long").alias("n_mentions"),
        (
            F.round(
                F.log(F.col("wt").cast("double"))
                - (F.col("swlw_micros").cast("double") / F.lit(1000000.0))
                / F.col("wt"),
                6,
            )
            + F.lit(0.0)
        ).alias("prior_entropy"),
    )


# ---------------------------------------------------------------------------
# KG evolution between crawl epochs — added/removed/kept report
# ---------------------------------------------------------------------------
@q(
    "kg_delta",
    f"""
    WITH {_GRAMS_SQL},
    {_DOCENT_SQL},
    de2 AS (SELECT DISTINCT doc_id % 2 AS epoch, doc_id, uri FROM de),
    pe AS (
      SELECT DISTINCT a.epoch, a.uri AS uri_a, b.uri AS uri_b
      FROM de2 a JOIN de2 b
        ON a.doc_id = b.doc_id AND a.uri < b.uri),
    es AS (
      SELECT uri_a, uri_b,
             MAX(CASE WHEN epoch = 0 THEN 1 ELSE 0 END) AS in0,
             MAX(CASE WHEN epoch = 1 THEN 1 ELSE 0 END) AS in1
      FROM pe GROUP BY uri_a, uri_b),
    ns AS (
      SELECT uri,
             MAX(CASE WHEN epoch = 0 THEN 1 ELSE 0 END) AS in0,
             MAX(CASE WHEN epoch = 1 THEN 1 ELSE 0 END) AS in1
      FROM de2 GROUP BY uri)
    SELECT 'edge' AS kind,
           CASE WHEN in0 = 0 THEN 'added'
                WHEN in1 = 0 THEN 'removed' ELSE 'kept' END AS status,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM es GROUP BY 2
    UNION ALL
    SELECT 'node',
           CASE WHEN in0 = 0 THEN 'added'
                WHEN in1 = 0 THEN 'removed' ELSE 'kept' END,
           CAST(COUNT(*) AS BIGINT)
    FROM ns GROUP BY 2
    """,
)
def kg_delta(spark, sf_dir):
    """KG evolution report between two crawl epochs (here the
    deterministic doc_id parity split stands in for snapshot t vs
    t+1): how many entities and co-occurrence edges were added,
    removed, or kept — the freshness/stability dashboard behind
    incremental KG construction (a rebuild that churns 40% of edges
    between crawls signals extraction drift, not the web changing).
    Presence flags come from ONE grouped MAX-CASE pass per kind —
    never a full-outer join of per-epoch subqueries, which would
    re-run the corpus subtree per epoch branch (the wave-32 lesson
    applied to set reconciliation; the snapshot_diff face makes the
    same choice). Counts are exact integers; output is ≤6 rows."""
    de = _doc_entities(spark, sf_dir)
    de2 = de.select(
        (F.col("doc_id") % 2).alias("epoch"), "doc_id", "uri"
    ).distinct()
    pe = (
        de2.alias("a")
        .join(
            de2.alias("b"),
            (F.col("a.doc_id") == F.col("b.doc_id"))
            & (F.col("a.uri") < F.col("b.uri")),
        )
        .select(
            F.col("a.epoch").alias("epoch"),
            F.col("a.uri").alias("uri_a"),
            F.col("b.uri").alias("uri_b"),
        )
        .distinct()
    )

    def _flags(rel, keys):
        return rel.groupBy(*keys).agg(
            F.max(F.when(F.col("epoch") == 0, 1).otherwise(0)).alias("in0"),
            F.max(F.when(F.col("epoch") == 1, 1).otherwise(0)).alias("in1"),
        )

    status = (
        F.when(F.col("in0") == 0, "added")
        .when(F.col("in1") == 0, "removed")
        .otherwise("kept")
    )
    es = (
        _flags(pe, ["uri_a", "uri_b"])
        .groupBy(status.alias("status"))
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
        .select(F.lit("edge").alias("kind"), "status", "n")
    )
    ns = (
        _flags(de2.select("epoch", "uri"), ["uri"])
        .groupBy(status.alias("status"))
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
        .select(F.lit("node").alias("kind"), "status", "n")
    )
    return es.unionByName(ns)


# ---------------------------------------------------------------------------
# local bridges — edges in no triangle (the weak-tie census)
# ---------------------------------------------------------------------------
@q(
    "kg_local_bridges",
    f"""
    WITH {_GRAMS_SQL},
    {_DOCENT_SQL},
    {_PAIRS_SQL},
    tri AS (
      SELECT e1.uri_a AS a1, e1.uri_b AS b1, e2.uri_b AS c1
      FROM p e1
      JOIN p e2 ON e2.uri_a = e1.uri_b
      JOIN p e3 ON e3.uri_a = e1.uri_a AND e3.uri_b = e2.uri_b),
    te AS (
      SELECT a1 AS u, b1 AS v FROM tri
      UNION SELECT b1, c1 FROM tri
      UNION SELECT a1, c1 FROM tri),
    ne AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_edges FROM p),
    nb AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_bridges
      FROM p LEFT JOIN te ON te.u = p.uri_a AND te.v = p.uri_b
      WHERE te.u IS NULL)
    SELECT n_edges, n_bridges,
           CASE WHEN n_edges = 0 THEN NULL
                ELSE round(n_bridges / CAST(n_edges AS DOUBLE), 6) + 0
           END AS bridge_ratio
    FROM ne CROSS JOIN nb
    """,
)
def kg_local_bridges(spark, sf_dir):
    """Local-bridge census: the fraction of co-occurrence edges that
    sit in NO triangle — Granovetter's weak ties, the links whose
    removal lengthens paths (an edge inside a triangle has a 2-hop
    detour; a local bridge does not). High bridge ratio = a sparse,
    chain-like KG; low = redundantly clustered. Triangle-member
    edges come from the SAME oriented a<b<c enumeration as
    kg_triangles (each triangle found once, wedge fan-out bounded by
    the lexicographic orientation's out-degree — the degree-skew
    guard), unpivoted to the three member edges and set-deduped;
    bridges are the anti-join remainder, left UNHINTED (the
    dedup_survivors lesson: the triangle-edge relation is
    graph-sized, AQE decides). The pairs relation is
    parquet-checkpointed — the enumeration touches it three times
    and the counts twice, and each alias would otherwise re-run the
    corpus containment join (the stat_mutual_info branch lesson)."""
    from ..operators.dedup import parquet_checkpoint

    p = parquet_checkpoint(_entity_pairs(spark, sf_dir), "bridges_p")
    e1, e2, e3 = p.alias("e1"), p.alias("e2"), p.alias("e3")
    tri = (
        e1.join(e2, F.col("e2.uri_a") == F.col("e1.uri_b"))
        .join(
            e3,
            (F.col("e3.uri_a") == F.col("e1.uri_a"))
            & (F.col("e3.uri_b") == F.col("e2.uri_b")),
        )
        .select(
            F.col("e1.uri_a").alias("a1"),
            F.col("e1.uri_b").alias("b1"),
            F.col("e2.uri_b").alias("c1"),
        )
    )
    te = (
        tri.select(F.col("a1").alias("u"), F.col("b1").alias("v"))
        .union(tri.select(F.col("b1").alias("u"), F.col("c1").alias("v")))
        .union(tri.select(F.col("a1").alias("u"), F.col("c1").alias("v")))
        .distinct()
    )
    nb = (
        p.join(
            te,
            (F.col("u") == F.col("uri_a")) & (F.col("v") == F.col("uri_b")),
            "left_anti",
        )
        .agg(F.count(F.lit(1)).cast("long").alias("n_bridges"))
    )
    ne = p.agg(F.count(F.lit(1)).cast("long").alias("n_edges"))
    return ne.crossJoin(nb).select(
        "n_edges",
        "n_bridges",
        F.when(F.col("n_edges") == 0, F.lit(None).cast("double"))
        .otherwise(
            F.round(
                F.col("n_bridges") / F.col("n_edges").cast("double"), 6
            )
            + F.lit(0.0)
        )
        .alias("bridge_ratio"),
    )
