"""KG-pipeline operators with DuckDB oracles, run over the driver's
``documents`` table with a shared inline dictionary (the oracle can
only see the registered views, so the dictionary/candidates/redirects
are literal VALUES in both engines — same rows, same semantics as the
store tables the real pipeline builds).

Covers the SQL-checkable faces of T3 spotting, J1 candidate lookup,
C1 prior scoring, A7 argmax, J4/J5 canonicalization, and P3 triple
materialization (SURVEY.md §2).
"""

from __future__ import annotations

import itertools as _itertools

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..operators.closure import canonicalize, redirect_closure
from .common import t

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


# Shared inline "world": surface forms with ambiguous candidates,
# single-hop redirects, disambiguation pages. Tokens chosen from the
# documents vocabulary so spotting actually fires.
SPOT_CANDIDATES: list[tuple[str, str, int]] = [
    ("spark", "dbr:Apache_Spark", 8),
    ("spark", "dbr:Spark_plug", 2),
    ("merge", "dbr:Merge_sort", 5),
    ("merge", "dbr:Git_merge", 3),
    ("merge", "dbr:Merge_(SQL)", 1),
    ("window", "dbr:Window_function", 6),
    ("window", "dbr:Window_(computing)", 4),
    ("hash join", "dbr:Hash_join", 9),
    ("table scan", "dbr:Full_table_scan", 7),
    ("sort merge", "dbr:Sort-merge_join", 5),
    ("data line", "dbr:Data_line", 3),
    ("vector", "dbr:Vector_(data)", 4),
    ("vector", "dbr:Vector_graphics", 4),  # tie -> uri asc break
]
REDIRECT_EDGES: list[tuple[str, str]] = [
    ("dbr:Git_merge", "dbr:Merge_(version_control)"),
    ("dbr:Spark_plug", "dbr:Ignition_part"),
]
DISAMBIG_URIS: list[str] = ["dbr:Merge_(SQL)"]


def _values_sql(rows, cols) -> str:
    def lit(v):
        return f"'{v}'" if isinstance(v, str) else str(v)

    vals = ", ".join("(" + ", ".join(lit(v) for v in r) + ")" for r in rows)
    return f"(VALUES {vals}) AS {cols}"


_DICT_SQL = _values_sql(SPOT_CANDIDATES, "d(sf, uri, w)")
_RED_SQL = _values_sql(REDIRECT_EDGES, "r(src_uri, dst_uri)")
_DIS_SQL = _values_sql([(u,) for u in DISAMBIG_URIS], "x(uri)")

_GRAMS_SQL = """
    t AS (SELECT doc_id, string_split(text, ' ') AS arr FROM documents),
    idx AS (SELECT doc_id, arr, generate_subscripts(arr, 1) AS i FROM t),
    grams AS (
      SELECT doc_id, i AS pos, arr[i] AS sf FROM idx
      UNION ALL
      SELECT doc_id, i AS pos, arr[i] || ' ' || arr[i+1] AS sf
      FROM idx WHERE i < len(arr))
"""


def _grams_spark(spark, sf_dir):
    docs = t(spark, sf_dir, "documents").select(
        "doc_id", F.split("text", " ").alias("arr")
    )
    uni = docs.select(
        "doc_id", F.posexplode("arr").alias("p0", "sf")
    ).select("doc_id", (F.col("p0") + 1).alias("pos"), "sf")
    bi = docs.filter(F.size("arr") >= 2).select(
        "doc_id",
        F.explode(
            F.expr(
                "transform(sequence(0, size(arr) - 2),"
                " i -> struct(i + 1 AS pos, concat(arr[i], ' ', arr[i+1]) AS sf))"
            )
        ).alias("g"),
    ).select("doc_id", "g.pos", "g.sf")
    return uni.unionByName(bi)


def _dict_df(spark):
    return spark.createDataFrame(SPOT_CANDIDATES, ["sf", "uri", "w"])


@q(
    "spot_mentions",
    f"""
    WITH {_GRAMS_SQL}
    SELECT g.sf AS surface_form, COUNT(*) AS n_mentions
    FROM grams g JOIN (SELECT DISTINCT sf FROM {_DICT_SQL}) d ON g.sf = d.sf
    GROUP BY g.sf
    """,
)
def spot_mentions(spark, sf_dir):
    """T3 spotting (token-granularity face): dictionary hits per sf."""
    grams = _grams_spark(spark, sf_dir)
    d = F.broadcast(_dict_df(spark).select("sf").distinct())
    return (
        grams.join(d, "sf")
        .groupBy(F.col("sf").alias("surface_form"))
        .agg(F.count(F.lit(1)).alias("n_mentions"))
    )


@q(
    "kg_annotate_prior",
    f"""
    WITH {_GRAMS_SQL},
    cand AS (
      SELECT g.doc_id, g.pos, g.sf AS surface_form, d.uri, d.w
      FROM grams g JOIN {_DICT_SQL} ON g.sf = d.sf),
    best AS (
      SELECT doc_id, pos, surface_form, uri,
             row_number() OVER (PARTITION BY doc_id, pos, surface_form
                                ORDER BY w DESC, uri) AS rn
      FROM cand)
    SELECT doc_id, pos, surface_form, uri FROM best WHERE rn = 1
    """,
)
def kg_annotate_prior(spark, sf_dir):
    """J1 candidate lookup + C1 prior scoring + A7 argmax (the
    `/candidates` -> best-prior face of the pipeline)."""
    grams = _grams_spark(spark, sf_dir)
    cand = grams.join(F.broadcast(_dict_df(spark)), "sf").withColumnRenamed(
        "sf", "surface_form"
    )
    w = Window.partitionBy("doc_id", "pos", "surface_form").orderBy(
        F.desc("w"), F.asc("uri")
    )
    return (
        cand.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("doc_id", "pos", "surface_form", "uri")
    )


@q(
    "kg_triples_mini",
    f"""
    WITH {_GRAMS_SQL},
    cand AS (
      SELECT g.doc_id, g.pos, g.sf AS surface_form, d.uri, d.w
      FROM grams g JOIN {_DICT_SQL} ON g.sf = d.sf),
    best AS (
      SELECT doc_id, pos, surface_form, uri,
             row_number() OVER (PARTITION BY doc_id, pos, surface_form
                                ORDER BY w DESC, uri) AS rn
      FROM cand),
    ann AS (SELECT doc_id, uri FROM best WHERE rn = 1),
    canon AS (
      SELECT a.doc_id, coalesce(r.dst_uri, a.uri) AS uri
      FROM ann a LEFT JOIN {_RED_SQL} ON a.uri = r.src_uri),
    kept AS (
      SELECT * FROM canon c
      WHERE NOT EXISTS (SELECT 1 FROM {_DIS_SQL} WHERE x.uri = c.uri))
    SELECT DISTINCT 'doc://' || CAST(doc_id AS VARCHAR) AS subj,
           'dbo:mentions' AS pred, uri AS obj
    FROM kept
    """,
)
def kg_triples_mini(spark, sf_dir):
    """Full mini-pipeline: spot -> prior argmax -> canonicalize
    (redirect closure + disambiguation drop) -> (subj,pred,obj)
    triples. Uses the production closure/canonicalize operators."""
    ann = kg_annotate_prior(spark, sf_dir).select("doc_id", "uri")
    red = spark.createDataFrame(REDIRECT_EDGES, ["src_uri", "dst_uri"])
    dis = spark.createDataFrame([(u,) for u in DISAMBIG_URIS], ["uri"])
    closure = redirect_closure(red, max_iter=4)
    canon = canonicalize(ann, closure, dis)
    return canon.select(
        F.concat(F.lit("doc://"), F.col("doc_id").cast("string")).alias("subj"),
        F.lit("dbo:mentions").alias("pred"),
        F.col("uri").alias("obj"),
    ).distinct()


@q(
    "kg_candidates",
    f"""
    WITH {_GRAMS_SQL},
    cand AS (
      SELECT g.doc_id, g.pos, g.sf AS surface_form, d.uri, d.w
      FROM grams g JOIN {_DICT_SQL} ON g.sf = d.sf),
    ranked AS (
      SELECT doc_id, pos, surface_form, uri,
             round(CAST(w AS DOUBLE) / SUM(w) OVER (
               PARTITION BY doc_id, pos, surface_form), 6) AS p_e_given_s,
             row_number() OVER (PARTITION BY doc_id, pos, surface_form
                                ORDER BY w DESC, uri) AS cand_rank
      FROM cand)
    SELECT doc_id, pos, surface_form, uri, p_e_given_s, cand_rank
    FROM ranked WHERE cand_rank <= 3
    """,
)
def kg_candidates(spark, sf_dir):
    """Reference lifecycle E3 (`/candidates`): the ranked candidate
    list per mention — stops after J1 + C1 + A7 top-k with NO argmax
    commit, returning P(e|s) per candidate. The third public entry
    point of the REST service (SURVEY.md §3.1), as a relational face."""
    grams = _grams_spark(spark, sf_dir)
    cand = grams.join(F.broadcast(_dict_df(spark)), "sf").withColumnRenamed(
        "sf", "surface_form"
    )
    key = ["doc_id", "pos", "surface_form"]
    w = Window.partitionBy(*key).orderBy(F.desc("w"), F.asc("uri"))
    return (
        cand.withColumn(
            "p_e_given_s",
            F.round(
                F.col("w").cast("double")
                / F.sum("w").over(Window.partitionBy(*key)),
                6,
            ),
        )
        .withColumn("cand_rank", F.row_number().over(w))
        .filter(F.col("cand_rank") <= 3)
        .select(
            "doc_id", "pos", "surface_form", "uri", "p_e_given_s", "cand_rank"
        )
    )


@q(
    "kg_disambiguate",
    f"""
    WITH {_GRAMS_SQL},
    spans AS (
      SELECT doc_id, pos, sf AS surface_form FROM grams
      WHERE pos % 3 = 1),
    cand AS (
      SELECT s.doc_id, s.pos, s.surface_form, d.uri, d.w
      FROM spans s JOIN {_DICT_SQL} ON s.surface_form = d.sf),
    scored AS (
      SELECT doc_id, pos, surface_form, uri, w,
             row_number() OVER (PARTITION BY doc_id, pos, surface_form
                                ORDER BY w DESC, uri) AS rn,
             lead(w) OVER (PARTITION BY doc_id, pos, surface_form
                           ORDER BY w DESC, uri) AS w2
      FROM cand)
    SELECT doc_id, pos, surface_form, uri,
           round(coalesce(CAST(w2 AS DOUBLE) / w, 0.0), 6)
             AS second_rank_ratio
    FROM scored WHERE rn = 1
    """,
)
def kg_disambiguate(spark, sf_dir):
    """Reference lifecycle E2 (`/disambiguate`): input arrives WITH
    mention spans already marked (SpotXmlParser upstream), so the
    front half — tokenize + spot — is skipped; candidate lookup,
    scoring, argmax, and the second-rank confidence run unchanged.
    The externally-supplied span list is synthesized deterministically
    on BOTH sides (every dictionary gram at pos%3==1 plays the role
    of a user-marked span). Emits the argmax entity per span plus
    percentileOfSecondRank's relational face (second_rank_ratio =
    runner-up weight / winner weight; 0 when unambiguous). Scale
    shape identical to E1's join half: spans join the broadcast
    dictionary; the per-span window partitions on (doc, pos, sf) —
    bounded groups, no skew."""
    grams = _grams_spark(spark, sf_dir)
    spans = grams.filter(F.col("pos") % 3 == 1).withColumnRenamed(
        "sf", "surface_form"
    )
    cand = spans.join(
        F.broadcast(_dict_df(spark).withColumnRenamed("sf", "surface_form")),
        "surface_form",
    )
    w = Window.partitionBy("doc_id", "pos", "surface_form").orderBy(
        F.desc("w"), F.asc("uri")
    )
    return (
        cand.withColumn("rn", F.row_number().over(w))
        .withColumn("w2", F.lead("w").over(w))
        .filter(F.col("rn") == 1)
        .select(
            "doc_id",
            "pos",
            "surface_form",
            "uri",
            F.round(
                F.coalesce(
                    F.col("w2").cast("double") / F.col("w"), F.lit(0.0)
                ),
                6,
            ).alias("second_rank_ratio"),
        )
    )


@q(
    "kg_export_json",
    f"""
    WITH {_GRAMS_SQL},
    cand AS (
      SELECT g.doc_id, g.pos, g.sf AS surface_form, d.uri, d.w
      FROM grams g JOIN {_DICT_SQL} ON g.sf = d.sf),
    best AS (
      SELECT doc_id, pos, surface_form, uri,
             row_number() OVER (PARTITION BY doc_id, pos, surface_form
                                ORDER BY w DESC, uri) AS rn
      FROM cand),
    ann AS (SELECT DISTINCT doc_id, uri FROM best WHERE rn = 1)
    SELECT 'doc://' || CAST(doc_id AS VARCHAR) AS subj,
           '{{"subj":"doc://' || CAST(doc_id AS VARCHAR)
             || '","pred":"dbo:mentions","obj":"' || uri || '"}}' AS line
    FROM ann
    """,
)
def kg_export_json(spark, sf_dir):
    """S5 annotation sink face: triples serialized to JSON lines via
    to_json(struct(...)) — the NIF-ish export format the reference's
    output serializers produce. The twin builds the same line
    textually (field order = struct order; no URI in this world needs
    escaping, so byte equality holds)."""
    ann = kg_annotate_prior(spark, sf_dir).select("doc_id", "uri").distinct()
    return ann.select(
        F.concat(F.lit("doc://"), F.col("doc_id").cast("string")).alias("subj"),
        F.to_json(
            F.struct(
                F.concat(
                    F.lit("doc://"), F.col("doc_id").cast("string")
                ).alias("subj"),
                F.lit("dbo:mentions").alias("pred"),
                F.col("uri").alias("obj"),
            )
        ).alias("line"),
    )


@q(
    "closure_bounded",
    """
    WITH e(src_uri, dst_uri) AS (VALUES
      ('a', 'b'), ('b', 'c'), ('c', 'd'),
      ('x', 'y'),
      ('p', 'q'), ('q', 'p'),
      ('m', 'p')),
    h1 AS (
      SELECT a.src_uri, coalesce(b.dst_uri, a.dst_uri) AS dst_uri
      FROM e a LEFT JOIN e b ON a.dst_uri = b.src_uri),
    h2 AS (
      SELECT a.src_uri, coalesce(b.dst_uri, a.dst_uri) AS dst_uri
      FROM h1 a LEFT JOIN h1 b ON a.dst_uri = b.src_uri)
    SELECT src_uri, dst_uri FROM h2 a
    WHERE NOT EXISTS (SELECT 1 FROM h2 b WHERE b.src_uri = a.dst_uri)
    """,
)
def closure_bounded(spark, sf_dir):
    """J4 redirect closure on a literal graph with a 3-chain, a
    2-cycle, and a chain feeding the 2-cycle. The SQL twin composes
    f∘f twice (the pointer jumping the production operator performs)
    then keeps only terminal targets (NOT EXISTS dst==src — the same
    stability rule as the operator's left_anti; cycle members and the
    chain into the cycle get no redirect)."""
    edges = spark.createDataFrame(
        [
            ("a", "b"), ("b", "c"), ("c", "d"),
            ("x", "y"),
            ("p", "q"), ("q", "p"),
            ("m", "p"),
        ],
        ["src_uri", "dst_uri"],
    )
    return redirect_closure(edges, max_iter=4)


# Shared CTE for the co-occurrence family: distinct (doc_id, entity)
# containment via the same gram spotting as the other pipeline faces
_DOCENT_SQL = f"""
    de AS (
      SELECT DISTINCT g.doc_id, d.uri
      FROM grams g JOIN {_DICT_SQL} ON g.sf = d.sf)
"""


def _doc_entities(spark, sf_dir):
    return (
        _grams_spark(spark, sf_dir)
        .join(F.broadcast(_dict_df(spark)), "sf")
        .select("doc_id", "uri")
        .distinct()
    )


@q(
    "kg_cooccurrence",
    f"""
    WITH {_GRAMS_SQL},
    {_DOCENT_SQL},
    ca AS (SELECT uri, COUNT(*) AS c FROM de GROUP BY uri),
    n AS (SELECT COUNT(DISTINCT doc_id) AS n_docs FROM documents),
    p AS (
      SELECT a.uri AS uri_a, b.uri AS uri_b, COUNT(*) AS n_ab
      FROM de a JOIN de b ON a.doc_id = b.doc_id AND a.uri < b.uri
      GROUP BY a.uri, b.uri)
    SELECT p.uri_a, p.uri_b, p.n_ab,
           round(ln((CAST(p.n_ab AS DOUBLE) * n.n_docs)
                    / (CAST(ca1.c AS DOUBLE) * ca2.c)), 6) AS pmi
    FROM p
    JOIN ca ca1 ON ca1.uri = p.uri_a
    JOIN ca ca2 ON ca2.uri = p.uri_b
    CROSS JOIN n
    """,
)
def kg_cooccurrence(spark, sf_dir):
    """Entity co-occurrence graph with PMI weights — the KG-
    construction step after annotation (relatedness edges between
    entities that share documents; the signal behind related-entity
    panels and disambiguation coherence priors). Scale shape: the
    per-document entity set is bounded (dictionary hits), so the
    doc-keyed self-join fans out quadratically only in that small
    per-doc set; both count dimensions attach by broadcast (the
    entity-marginal relation is |E|-sized, not corpus-sized)."""
    de = _doc_entities(spark, sf_dir)
    docs = t(spark, sf_dir, "documents")
    n = docs.select(F.countDistinct("doc_id").alias("n_docs"))
    ca = de.groupBy("uri").agg(F.count(F.lit(1)).alias("c"))
    pairs = (
        de.alias("a")
        .join(de.alias("b"), "doc_id")
        .filter(F.col("a.uri") < F.col("b.uri"))
        .groupBy(
            F.col("a.uri").alias("uri_a"), F.col("b.uri").alias("uri_b")
        )
        .agg(F.count(F.lit(1)).alias("n_ab"))
    )
    return (
        pairs.join(
            F.broadcast(
                ca.select(F.col("uri").alias("uri_a"), F.col("c").alias("c_a"))
            ),
            "uri_a",
        )
        .join(
            F.broadcast(
                ca.select(F.col("uri").alias("uri_b"), F.col("c").alias("c_b"))
            ),
            "uri_b",
        )
        .crossJoin(F.broadcast(n))
        .select(
            "uri_a",
            "uri_b",
            "n_ab",
            F.round(
                F.log(
                    (F.col("n_ab").cast("double") * F.col("n_docs"))
                    / (F.col("c_a").cast("double") * F.col("c_b"))
                ),
                6,
            ).alias("pmi"),
        )
    )


def _pagerank_iter_sql(prev: str, cur: str) -> str:
    """One unrolled PageRank iteration as a CTE (the oracle twin of
    operators.closure.pagerank's loop body)."""
    return f"""
    {cur} AS (
      SELECT v.uri,
             CAST(0.15 AS DOUBLE) / nv.n_v
               + CAST(0.85 AS DOUBLE) * COALESCE(s.m, CAST(0 AS DOUBLE))
               AS rank
      FROM v CROSS JOIN nv
      LEFT JOIN (
        SELECT e.dst AS uri, SUM(r.rank / deg.outdeg) AS m
        FROM e JOIN {prev} r ON e.src = r.uri
        JOIN deg ON deg.src = e.src
        GROUP BY e.dst) s ON s.uri = v.uri)
"""


@q(
    "kg_pagerank",
    f"""
    WITH {_GRAMS_SQL},
    {_DOCENT_SQL},
    p AS (
      SELECT a.uri AS uri_a, b.uri AS uri_b
      FROM de a JOIN de b ON a.doc_id = b.doc_id AND a.uri < b.uri
      GROUP BY a.uri, b.uri),
    e AS (SELECT uri_a AS src, uri_b AS dst FROM p
          UNION ALL SELECT uri_b, uri_a FROM p),
    v AS (SELECT DISTINCT src AS uri FROM e),
    nv AS (SELECT COUNT(*) AS n_v FROM v),
    deg AS (SELECT src, COUNT(*) AS outdeg FROM e GROUP BY src),
    r0 AS (SELECT v.uri, CAST(1.0 AS DOUBLE) / nv.n_v AS rank
           FROM v CROSS JOIN nv),
    {_pagerank_iter_sql("r0", "r1")},
    {_pagerank_iter_sql("r1", "r2")},
    {_pagerank_iter_sql("r2", "r3")}
    SELECT uri, round(rank, 6) AS rank FROM r3
    """,
)
def kg_pagerank(spark, sf_dir):
    """Entity salience: 3-iteration PageRank (d=0.85) over the
    symmetric co-occurrence graph. The operator's per-iteration plan
    is broadcast-only (rank/degree are |E|ntity-sized); the oracle is
    the same recurrence unrolled as SQL CTEs."""
    from ..operators.closure import pagerank

    de = _doc_entities(spark, sf_dir)
    pairs = (
        de.alias("a")
        .join(de.alias("b"), "doc_id")
        .filter(F.col("a.uri") < F.col("b.uri"))
        .select(F.col("a.uri").alias("uri_a"), F.col("b.uri").alias("uri_b"))
        .distinct()
    )
    edges = pairs.select(
        F.col("uri_a").alias("src"), F.col("uri_b").alias("dst")
    ).unionByName(
        pairs.select(F.col("uri_b").alias("src"), F.col("uri_a").alias("dst"))
    )
    pr = pagerank(edges, iterations=3, damping=0.85)
    return pr.select("uri", F.round("rank", 6).alias("rank"))


# Shared SQL CTE: distinct co-occurrence pairs (uri_a < uri_b)
_PAIRS_SQL = """
    p AS (
      SELECT a.uri AS uri_a, b.uri AS uri_b
      FROM de a JOIN de b ON a.doc_id = b.doc_id AND a.uri < b.uri
      GROUP BY a.uri, b.uri)
"""


def _entity_pairs(spark, sf_dir):
    de = _doc_entities(spark, sf_dir)
    return (
        de.alias("a")
        .join(de.alias("b"), "doc_id")
        .filter(F.col("a.uri") < F.col("b.uri"))
        .select(F.col("a.uri").alias("uri_a"), F.col("b.uri").alias("uri_b"))
        .distinct()
    )


@q(
    "kg_degree",
    f"""
    WITH {_GRAMS_SQL},
    {_DOCENT_SQL},
    {_PAIRS_SQL},
    e AS (SELECT uri_a AS uri, n_ab FROM
            (SELECT uri_a, uri_b, COUNT(*) AS n_ab
             FROM (SELECT a.uri AS uri_a, b.uri AS uri_b
                   FROM de a JOIN de b
                     ON a.doc_id = b.doc_id AND a.uri < b.uri) q
             GROUP BY uri_a, uri_b) w
          UNION ALL
          SELECT uri_b, n_ab FROM
            (SELECT uri_a, uri_b, COUNT(*) AS n_ab
             FROM (SELECT a.uri AS uri_a, b.uri AS uri_b
                   FROM de a JOIN de b
                     ON a.doc_id = b.doc_id AND a.uri < b.uri) q
             GROUP BY uri_a, uri_b) w)
    SELECT uri, CAST(COUNT(*) AS BIGINT) AS degree,
           CAST(SUM(n_ab) AS BIGINT) AS strength
    FROM e GROUP BY uri
    """,
)
def kg_degree(spark, sf_dir):
    """Entity degree + co-occurrence strength over the constructed
    graph (the node-importance summary feeding entity pruning and
    hub detection). One weighted-pair agg + a symmetric unpivot +
    one final agg — both aggs map-side combinable; nothing touches
    the corpus after the shared doc-entity containment relation."""
    de = _doc_entities(spark, sf_dir)
    weighted = (
        de.alias("a")
        .join(de.alias("b"), "doc_id")
        .filter(F.col("a.uri") < F.col("b.uri"))
        .groupBy(
            F.col("a.uri").alias("uri_a"), F.col("b.uri").alias("uri_b")
        )
        .agg(F.count(F.lit(1)).alias("n_ab"))
    )
    e = weighted.select(
        F.col("uri_a").alias("uri"), "n_ab"
    ).unionByName(weighted.select(F.col("uri_b").alias("uri"), "n_ab"))
    return e.groupBy("uri").agg(
        F.count(F.lit(1)).cast("long").alias("degree"),
        F.sum("n_ab").cast("long").alias("strength"),
    )


@q(
    "kg_triangles",
    f"""
    WITH {_GRAMS_SQL},
    {_DOCENT_SQL},
    {_PAIRS_SQL}
    SELECT CAST(COUNT(*) AS BIGINT) AS n_triangles
    FROM p e1
    JOIN p e2 ON e2.uri_a = e1.uri_b
    JOIN p e3 ON e3.uri_a = e1.uri_a AND e3.uri_b = e2.uri_b
    """,
)
def kg_triangles(spark, sf_dir):
    """Global triangle count on the co-occurrence graph (clustering /
    community signal). ORIENTED enumeration — edges stored once with
    uri_a < uri_b and joined a<b<c — so each triangle is produced
    exactly once and the quadratic wedge set is bounded by the
    out-degree of the lexicographic orientation, the standard
    degree-skew guard for triangle counting at scale (high-degree
    hubs mostly receive edges under the ordering instead of fanning
    wedges out)."""
    p = _entity_pairs(spark, sf_dir)
    e1 = p.alias("e1")
    e2 = p.alias("e2")
    e3 = p.alias("e3")
    wedges = e1.join(e2, F.col("e2.uri_a") == F.col("e1.uri_b"))
    tri = wedges.join(
        e3,
        (F.col("e3.uri_a") == F.col("e1.uri_a"))
        & (F.col("e3.uri_b") == F.col("e2.uri_b")),
    )
    return tri.agg(F.count(F.lit(1)).cast("long").alias("n_triangles"))


_UEDGES_SQL = """
    e AS (SELECT uri_a AS src, uri_b AS dst FROM p
          UNION ALL SELECT uri_b, uri_a FROM p)
"""

# Degree cap shared by every wedge-/hop-generating face (VERDICT r4
# "What's wrong" #1). Wedge fan-out is sum(deg^2) over wedge
# participants, so one celebrity-entity hub of degree 10^6 emits 10^12
# rows from a single join key — a skewed-shuffle scale-killer. ``ce``
# is the edge list restricted to the subgraph induced on nodes of
# degree <= KG_WEDGE_DEG_CAP (the kg_squares / dedup_jaccard df-cap
# precedent, operators/dedup.py:201), bounding per-key fan-out at
# cap^2. BOTH engines apply the identical cap — the fragment below is
# the DuckDB mirror of ``_capped_edges`` — so the faces stay exact and
# hash-checkable; the synthetic fixture graph is hub-free, so the cap
# does not bind at test scale.
KG_WEDGE_DEG_CAP = 64

_CEDGES_SQL = f"""
    alldeg AS (SELECT src, COUNT(*) AS d FROM e GROUP BY src),
    okv AS (SELECT src FROM alldeg WHERE d <= {KG_WEDGE_DEG_CAP}),
    ce AS (SELECT e.src, e.dst FROM e
           JOIN okv ka ON ka.src = e.src
           JOIN okv kb ON kb.src = e.dst)
"""


def _undirected_edges(spark, sf_dir):
    p = _entity_pairs(spark, sf_dir)
    return p.select(
        F.col("uri_a").alias("src"), F.col("uri_b").alias("dst")
    ).unionByName(
        p.select(F.col("uri_b").alias("src"), F.col("uri_a").alias("dst"))
    )


def _capped_edges(e, max_deg=KG_WEDGE_DEG_CAP):
    """Edge list of the subgraph induced on nodes of degree <= max_deg.

    Takes the already-built undirected edge DataFrame (never rebuilds
    it — the checkpoint-consumers rule: a second ``_undirected_edges``
    call would re-scan the corpus subtree per consumer). Two UNHINTED
    left-semi joins against the |V|-bounded keep set — AQE broadcasts
    the keep set when it fits and shuffles when a web-scale vertex set
    does not (the text_unigram_lm vocabulary-broadcast lesson)."""
    deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("d"))
    ok = deg.filter(F.col("d") <= max_deg).select("src")
    return (
        e.join(ok, "src", "left_semi")
        .join(ok.withColumnRenamed("src", "dst"), "dst", "left_semi")
        .select("src", "dst")
    )


@q(
    "kg_khop",
    f"""
    WITH {_GRAMS_SQL},
    {_DOCENT_SQL},
    {_PAIRS_SQL},
    {_UEDGES_SQL},
    {_CEDGES_SQL},
    two AS (SELECT e1.src, e2.dst FROM ce e1
            JOIN ce e2 ON e1.dst = e2.src WHERE e2.dst <> e1.src),
    reach AS (SELECT src, dst FROM e UNION SELECT src, dst FROM two)
    SELECT src AS uri, CAST(COUNT(*) AS BIGINT) AS n_2hop
    FROM reach GROUP BY src
    """,
)
def kg_khop(spark, sf_dir):
    """Bounded graph traversal: per entity, the number of DISTINCT
    entities reachable within 2 hops on the undirected co-occurrence
    graph (neighborhood size — the locality signal behind related-
    entity expansion and graph-feature engineering). One hop-join on
    the edge list (dst = src), self-paths excluded, then a distinct
    union of the 1- and 2-hop frontiers. Scale shape: each hop is an
    equi-join keyed by the frontier node, and the 2-hop expansion
    runs on the deg <= 64 (KG_WEDGE_DEG_CAP) induced subgraph
    (``_capped_edges`` — the jaccard df-cap / kg_squares precedent,
    operators/dedup.py:201), which bounds hub fan-out at cap^2; the
    cap is mirrored verbatim in the DuckDB twin, and the fixture
    graph is hub-free so it does not bind at test scale."""
    e = _undirected_edges(spark, sf_dir)
    ce = _capped_edges(e)
    two = (
        ce.alias("e1")
        .join(ce.alias("e2"), F.col("e1.dst") == F.col("e2.src"))
        .filter(F.col("e2.dst") != F.col("e1.src"))
        .select(F.col("e1.src").alias("src"), F.col("e2.dst").alias("dst"))
    )
    reach = e.unionByName(two).distinct()
    return reach.groupBy(F.col("src").alias("uri")).agg(
        F.count(F.lit(1)).cast("long").alias("n_2hop")
    )


@q(
    "kg_shortest_path",
    f"""
    WITH {_GRAMS_SQL},
    {_DOCENT_SQL},
    {_PAIRS_SQL},
    {_UEDGES_SQL},
    {_CEDGES_SQL},
    s AS (SELECT MIN(uri) AS uri FROM de),
    d1 AS (SELECT DISTINCT e.dst AS uri FROM e JOIN s ON e.src = s.uri),
    d2 AS (SELECT DISTINCT ce.dst AS uri FROM ce JOIN d1 ON ce.src = d1.uri),
    d3 AS (SELECT DISTINCT ce.dst AS uri FROM ce JOIN d2 ON ce.src = d2.uri),
    lv AS (SELECT uri, 0 AS dist FROM s
           UNION ALL SELECT uri, 1 FROM d1
           UNION ALL SELECT uri, 2 FROM d2
           UNION ALL SELECT uri, 3 FROM d3)
    SELECT uri, CAST(MIN(dist) AS INT) AS dist
    FROM lv GROUP BY uri
    """,
)
def kg_shortest_path(spark, sf_dir):
    """Bounded single-source shortest path (BFS to 3 hops) on the
    undirected co-occurrence graph, from the lexicographically-first
    entity — the reachability/radius probe behind KG-quality checks
    ("is the graph one blob or islands?") and path-feature
    engineering. Each hop is one frontier-keyed equi-join on the edge
    list; the final min-agg collapses revisits to the first (shortest)
    level, so frontiers need no visited-set state and the twin stays
    pure SQL. Scale shape: hop joins shuffle only the frontier (never
    the corpus); expansions past the first hop run on the
    deg <= 64 (KG_WEDGE_DEG_CAP) induced subgraph (``_capped_edges``,
    mirrored in the twin — the source's own edges are kept so a hub
    source is not disconnected), which bounds frontier blow-up;
    production BFS additionally prunes each frontier with a left_anti
    against the visited set to stop re-expanding old nodes (same
    shape as operators/closure.py's pointer jumping) — that changes
    cost, not the min-dist result."""
    e = _undirected_edges(spark, sf_dir)
    ce = _capped_edges(e)
    de = _doc_entities(spark, sf_dir)
    s = de.agg(F.min("uri").alias("uri"))
    hops = [s]
    for hop_e in (e, ce, ce):
        prev = hops[-1].select("uri").distinct()
        nxt = (
            hop_e.join(F.broadcast(prev), hop_e.src == prev.uri)
            .select(F.col("dst").alias("uri"))
            .distinct()
        )
        hops.append(nxt)
    lv = None
    for dist, h in enumerate(hops):
        lab = h.select("uri", F.lit(dist).alias("dist"))
        lv = lab if lv is None else lv.unionByName(lab)
    return lv.groupBy("uri").agg(F.min("dist").cast("int").alias("dist"))


# Shared 2-round min-label-propagation CTE (over nodes `de` and
# undirected edges `e`) — used by kg_labelprop and kg_modularity so
# both faces see the identical community assignment.
_LPA_SQL = """
    nodes AS (SELECT DISTINCT uri FROM de),
    l1 AS (SELECT n.uri,
                  LEAST(n.uri, COALESCE(MIN(e.dst), n.uri)) AS lbl
           FROM nodes n LEFT JOIN e ON e.src = n.uri
           GROUP BY n.uri),
    l2 AS (SELECT a.uri,
                  LEAST(a.lbl, COALESCE(MIN(m.lbl), a.lbl)) AS community
           FROM l1 a
           LEFT JOIN e ON e.src = a.uri
           LEFT JOIN l1 m ON m.uri = e.dst
           GROUP BY a.uri, a.lbl)
"""


def _lpa_two_rounds(e, nodes):
    """Synchronous min-label propagation, 2 unrolled rounds, over an
    undirected edge list (src, dst) — the Spark twin of ``_LPA_SQL``.
    Returns df(uri, community)."""
    lbl = nodes.withColumn("lbl", F.col("uri"))
    for _ in range(2):
        nb = (
            e.join(
                lbl.select(F.col("uri").alias("dst"), F.col("lbl").alias("nlbl")),
                "dst",
            )
            .groupBy(F.col("src").alias("uri"))
            .agg(F.min("nlbl").alias("nmin"))
        )
        lbl = (
            lbl.join(nb, "uri", "left")
            .select(
                "uri",
                F.least(F.col("lbl"), F.coalesce("nmin", "lbl")).alias("lbl"),
            )
        )
    return lbl.select("uri", F.col("lbl").alias("community"))


@q(
    "kg_labelprop",
    f"""
    WITH {_GRAMS_SQL},
    {_DOCENT_SQL},
    {_PAIRS_SQL},
    {_UEDGES_SQL},
    {_LPA_SQL}
    SELECT uri, community FROM l2
    """,
)
def kg_labelprop(spark, sf_dir):
    """Synchronous min-label propagation (2 unrolled rounds) — the
    community-detection building block (LPA) over the co-occurrence
    graph; after round k every node carries the smallest entity id
    within k hops, and at fixpoint labels = connected components.
    Per round: one neighbor join keyed on the edge src + one min-agg
    per node (map-side combinable), exactly the join shape
    operators/dedup.py's large-star/small-star CC iterates — this
    face unrolls 2 rounds so the DuckDB twin is plain SQL (the
    embed_kmeans precedent for iterative algorithms). LEFT joins keep
    isolated entities as their own singleton community. Scale shape:
    labels relation is |V|-sized, edges shuffle once per round keyed
    by src; hot hubs are exactly the large-star case and inherit that
    operator's remedy at fixpoint scale."""
    e = _undirected_edges(spark, sf_dir)
    nodes = _doc_entities(spark, sf_dir).select("uri").distinct()
    return _lpa_two_rounds(e, nodes)


_NT_PREFIX = "http://dbpedia.org/resource/"


@q(
    "kg_export_nt",
    f"""
    WITH {_GRAMS_SQL},
    cand AS (
      SELECT g.doc_id, g.pos, g.sf AS surface_form, d.uri, d.w
      FROM grams g JOIN {_DICT_SQL} ON g.sf = d.sf),
    best AS (
      SELECT doc_id, pos, surface_form, uri,
             row_number() OVER (PARTITION BY doc_id, pos, surface_form
                                ORDER BY w DESC, uri) AS rn
      FROM cand),
    ann AS (SELECT DISTINCT doc_id, uri FROM best WHERE rn = 1)
    SELECT '<http://doc/' || CAST(doc_id AS VARCHAR)
             || '> <http://dbpedia.org/ontology/mentions> <{_NT_PREFIX}'
             || substr(uri, 5) || '> .' AS line
    FROM ann
    """,
)
def kg_export_nt(spark, sf_dir):
    """S5/P3 triple sink face, N-Triples flavor: the same annotation
    set as kg_export_json serialized as `<s> <p> <o> .` lines with the
    dbr: prefix expanded to full resource IRIs — the reference's own
    interchange format (its redirect/disambiguation/type inputs are NT
    dumps; S3's read_nt_triples is the matching source). Pure string
    concat in both engines (this world's IRIs need no %-escaping, so
    byte equality holds); tests/test_faces3 pins the round-trip
    export -> read_nt_triples -> identical triple set, the sink/source
    inverse pair. Scale shape: map-only over the deduped annotation
    relation; text sinks shard like any other write."""
    ann = kg_annotate_prior(spark, sf_dir).select("doc_id", "uri").distinct()
    return ann.select(
        F.concat(
            F.lit("<http://doc/"),
            F.col("doc_id").cast("string"),
            F.lit("> <http://dbpedia.org/ontology/mentions> <"),
            F.lit(_NT_PREFIX),
            F.expr("substring(uri, 5)"),
            F.lit("> ."),
        ).alias("line")
    )


@q(
    "kg_hits",
    f"""
    WITH {_GRAMS_SQL},
    {_DOCENT_SQL},
    {_PAIRS_SQL},
    nodes AS (SELECT DISTINCT uri FROM de),
    a1 AS (SELECT uri_b AS uri, CAST(COUNT(*) AS DOUBLE) AS a
           FROM p GROUP BY uri_b),
    h1 AS (SELECT p.uri_a AS uri, CAST(SUM(a1.a) AS DOUBLE) AS h
           FROM p JOIN a1 ON a1.uri = p.uri_b GROUP BY p.uri_a),
    mx AS (SELECT (SELECT MAX(a) FROM a1) AS amax,
                  (SELECT MAX(h) FROM h1) AS hmax)
    SELECT n.uri,
           round(COALESCE(h1.h, 0) / mx.hmax, 6) AS hub,
           round(COALESCE(a1.a, 0) / mx.amax, 6) AS auth
    FROM nodes n
    LEFT JOIN a1 ON a1.uri = n.uri
    LEFT JOIN h1 ON h1.uri = n.uri
    CROSS JOIN mx
    """,
)
def kg_hits(spark, sf_dir):
    """HITS hubs/authorities (one unrolled mutual-reinforcement round,
    max-normalized) over the ORIENTED co-occurrence graph — the
    link-analysis complement to kg_pagerank (authority = pointed-at by
    many; hub = points at many good authorities; on the lexicographic
    orientation these are asymmetric, which is exactly what makes the
    face non-trivial). auth_1 is the in-degree agg, hub_1 re-joins the
    edge list against that |V|-sized relation — both map-side
    combinable, both keyed by a graph vertex, and the normalizing max
    is a 2-value aggregate cross-joined back by broadcast. Scores are
    ratios of small exact integers, so round-6 equality across engines
    is exact. Scale shape: two edge-keyed aggs + one broadcast — the
    same plan family as kg_degree; more iterations repeat the pair of
    joins (embed_kmeans' unrolling precedent)."""
    p = _entity_pairs(spark, sf_dir)
    nodes = _doc_entities(spark, sf_dir).select("uri").distinct()
    a1 = p.groupBy(F.col("uri_b").alias("uri")).agg(
        F.count(F.lit(1)).cast("double").alias("a")
    )
    h1 = (
        p.join(a1.withColumnRenamed("uri", "uri_b"), "uri_b")
        .groupBy(F.col("uri_a").alias("uri"))
        .agg(F.sum("a").alias("h"))
    )
    mx = a1.agg(F.max("a").alias("amax")).crossJoin(
        h1.agg(F.max("h").alias("hmax"))
    )
    return (
        nodes.join(a1, "uri", "left")
        .join(h1, "uri", "left")
        .crossJoin(F.broadcast(mx))
        .select(
            "uri",
            F.round(F.coalesce("h", F.lit(0.0)) / F.col("hmax"), 6).alias(
                "hub"
            ),
            F.round(F.coalesce("a", F.lit(0.0)) / F.col("amax"), 6).alias(
                "auth"
            ),
        )
    )


@q(
    "kg_node_sim",
    f"""
    WITH {_GRAMS_SQL},
    {_DOCENT_SQL},
    {_PAIRS_SQL},
    {_UEDGES_SQL},
    {_CEDGES_SQL},
    deg AS (SELECT src, COUNT(*) AS d FROM e GROUP BY src),
    cm AS (SELECT e1.src AS ua, e2.src AS ub, COUNT(*) AS nc
           FROM ce e1 JOIN ce e2 ON e1.dst = e2.dst AND e1.src < e2.src
           GROUP BY e1.src, e2.src)
    SELECT p.uri_a, p.uri_b,
           CAST(COALESCE(cm.nc, 0) AS BIGINT) AS n_common,
           round(CAST(COALESCE(cm.nc, 0) AS DOUBLE)
                 / (da.d + db.d - COALESCE(cm.nc, 0)), 6) AS jaccard
    FROM p
    LEFT JOIN cm ON cm.ua = p.uri_a AND cm.ub = p.uri_b
    JOIN deg da ON da.src = p.uri_a
    JOIN deg db ON db.src = p.uri_b
    """,
)
def kg_node_sim(spark, sf_dir):
    """Structural node similarity for every CONNECTED entity pair:
    Jaccard overlap of undirected neighborhoods (|N(a) ∩ N(b)| /
    |N(a) ∪ N(b)|) — the link-prediction / relatedness refinement
    over raw co-occurrence (two entities that share most neighbors
    are near-synonyms even if they rarely co-occur directly). The
    common-neighbor count is a wedge self-join keyed on the SHARED
    neighbor, restricted to pairs that are already edges (output stays
    O(|E|), never all-pairs), then degrees attach from a |V|-sized
    relation. Scale shape: the wedge join fans out quadratically in
    hub degree, so it runs on the deg <= 64 (KG_WEDGE_DEG_CAP)
    induced subgraph (``_capped_edges`` — dedup_jaccard's df-cap /
    kg_squares precedent, operators/dedup.py:201), bounding skew
    without changing the top of the similarity ranking; the DuckDB
    twin applies the identical cap, and the fixture graph is hub-free
    so the face stays exact and SQL-checkable (denominator degrees
    stay the FULL-graph degrees — only the common-neighbor wedge is
    capped, so jaccard is never overstated). The |V|-sized degree
    marginals attach UNHINTED — AQE broadcasts iff they fit (the
    text_unigram_lm vocabulary-broadcast lesson; |V| can run to
    billions of entities at web scale). Ratios of small exact
    integers -> round-6 equality is exact."""
    p = _entity_pairs(spark, sf_dir)
    e = _undirected_edges(spark, sf_dir)
    ce = _capped_edges(e)
    deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("d"))
    cm = (
        ce.alias("e1")
        .join(
            ce.alias("e2"),
            (F.col("e1.dst") == F.col("e2.dst"))
            & (F.col("e1.src") < F.col("e2.src")),
        )
        .groupBy(
            F.col("e1.src").alias("uri_a"), F.col("e2.src").alias("uri_b")
        )
        .agg(F.count(F.lit(1)).alias("nc"))
    )
    nc = F.coalesce("nc", F.lit(0))
    return (
        p.join(cm, ["uri_a", "uri_b"], "left")
        .join(
            deg.select(F.col("src").alias("uri_a"), F.col("d").alias("da")),
            "uri_a",
        )
        .join(
            deg.select(F.col("src").alias("uri_b"), F.col("d").alias("db")),
            "uri_b",
        )
        .select(
            "uri_a",
            "uri_b",
            nc.cast("long").alias("n_common"),
            F.round(
                nc.cast("double") / (F.col("da") + F.col("db") - nc), 6
            ).alias("jaccard"),
        )
    )


@q(
    "kg_clustering",
    f"""
    WITH {_GRAMS_SQL},
    {_DOCENT_SQL},
    {_PAIRS_SQL},
    {_UEDGES_SQL},
    tri AS (SELECT e1.uri_a AS va, e1.uri_b AS vb, e2.uri_b AS vc
            FROM p e1
            JOIN p e2 ON e2.uri_a = e1.uri_b
            JOIN p e3 ON e3.uri_a = e1.uri_a AND e3.uri_b = e2.uri_b),
    tv AS (SELECT uri, COUNT(*) AS nt FROM (
             SELECT va AS uri FROM tri
             UNION ALL SELECT vb FROM tri
             UNION ALL SELECT vc FROM tri) u
           GROUP BY uri),
    deg AS (SELECT src AS uri, COUNT(*) AS d FROM e GROUP BY src)
    SELECT deg.uri,
           CAST(d AS BIGINT) AS degree,
           CAST(COALESCE(nt, 0) AS BIGINT) AS n_tri,
           CASE WHEN d >= 2
                THEN round(CAST(2 * COALESCE(nt, 0) AS DOUBLE)
                           / (d * (d - 1)), 6)
                ELSE 0.0 END AS coeff
    FROM deg LEFT JOIN tv ON tv.uri = deg.uri
    """,
)
def kg_clustering(spark, sf_dir):
    """Per-node local clustering coefficient 2*tri(v) / (deg(v) *
    (deg(v)-1)) — the community-density signal behind entity-cluster
    detection and hub/bridge classification on the co-occurrence
    graph. Triangles come from the SAME oriented enumeration as
    kg_triangles (each triangle materialized exactly once, wedge
    fan-out bounded by lexicographic out-degree), then credited to
    all three corners by a 3-way unpivot + count — never a per-node
    neighborhood self-join, which would square hub degree a second
    time. Degrees attach from the |V|-sized relation by broadcast.
    Ratio of small exact integers -> round-6 equality is exact."""
    p = _entity_pairs(spark, sf_dir)
    e1, e2, e3 = p.alias("e1"), p.alias("e2"), p.alias("e3")
    tri = (
        e1.join(e2, F.col("e2.uri_a") == F.col("e1.uri_b"))
        .join(
            e3,
            (F.col("e3.uri_a") == F.col("e1.uri_a"))
            & (F.col("e3.uri_b") == F.col("e2.uri_b")),
        )
        .select(
            F.col("e1.uri_a").alias("va"),
            F.col("e1.uri_b").alias("vb"),
            F.col("e2.uri_b").alias("vc"),
        )
    )
    tv = (
        tri.select(F.col("va").alias("uri"))
        .unionByName(tri.select(F.col("vb").alias("uri")))
        .unionByName(tri.select(F.col("vc").alias("uri")))
        .groupBy("uri")
        .agg(F.count(F.lit(1)).alias("nt"))
    )
    deg = _undirected_edges(spark, sf_dir).groupBy(
        F.col("src").alias("uri")
    ).agg(F.count(F.lit(1)).alias("d"))
    nt = F.coalesce("nt", F.lit(0))
    return deg.join(tv, "uri", "left").select(
        "uri",
        F.col("d").cast("long").alias("degree"),
        nt.cast("long").alias("n_tri"),
        F.when(
            F.col("d") >= 2,
            F.round(
                (2 * nt).cast("double") / (F.col("d") * (F.col("d") - 1)), 6
            ),
        )
        .otherwise(F.lit(0.0))
        .alias("coeff"),
    )


@q(
    "graph_degree_dist",
    f"""
    WITH {_GRAMS_SQL},
    {_DOCENT_SQL},
    {_PAIRS_SQL},
    {_UEDGES_SQL},
    deg AS (SELECT src, COUNT(*) AS d FROM e GROUP BY src)
    SELECT CAST(d AS BIGINT) AS degree,
           CAST(COUNT(*) AS BIGINT) AS n_nodes
    FROM deg GROUP BY d
    """,
)
def graph_degree_dist(spark, sf_dir):
    """Degree distribution of the co-occurrence graph — the one-look
    summary that decides every downstream scale knob (hub caps for
    the wedge joins, salting thresholds, power-law tail mass). Two
    chained map-side-combinable aggs; output is O(max degree), so at
    web scale this is the cheap probe you run BEFORE the expensive
    graph ops to size their df-caps."""
    deg = _undirected_edges(spark, sf_dir).groupBy("src").agg(
        F.count(F.lit(1)).alias("d")
    )
    return deg.groupBy(F.col("d").cast("long").alias("degree")).agg(
        F.count(F.lit(1)).cast("long").alias("n_nodes")
    )


@q(
    "kg_assortativity",
    f"""
    WITH {_GRAMS_SQL},
    {_DOCENT_SQL},
    {_PAIRS_SQL},
    {_UEDGES_SQL},
    deg AS (SELECT src, CAST(COUNT(*) AS BIGINT) AS d FROM e GROUP BY src),
    ed AS (SELECT ds.d AS x, dd.d AS y
           FROM e
           JOIN deg ds ON ds.src = e.src
           JOIN deg dd ON dd.src = e.dst),
    s AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
                 CAST(SUM(x) AS BIGINT) AS sx,
                 CAST(SUM(y) AS BIGINT) AS sy,
                 CAST(SUM(x * x) AS BIGINT) AS sxx,
                 CAST(SUM(y * y) AS BIGINT) AS syy,
                 CAST(SUM(x * y) AS BIGINT) AS sxy
          FROM ed)
    SELECT n AS n_directed_edges,
           CASE WHEN n * sxx - sx * sx = 0 OR n * syy - sy * sy = 0
                THEN NULL
                ELSE round((CAST(n AS DOUBLE) * sxy
                            - CAST(sx AS DOUBLE) * sy)
                           / sqrt((CAST(n AS DOUBLE) * sxx
                                   - CAST(sx AS DOUBLE) * sx)
                                  * (CAST(n AS DOUBLE) * syy
                                     - CAST(sy AS DOUBLE) * sy)), 6)
           END AS assortativity
    FROM s
    """,
)
def kg_assortativity(spark, sf_dir):
    """Degree assortativity (Pearson correlation of endpoint degrees
    over all directed edges) — one number that says whether hubs link
    to hubs (assortative, social-graph-like) or to leaves
    (disassortative, web/KG-like), which predicts how badly the
    wedge-join faces will skew. Degrees attach to the edge list by
    two broadcast joins (the degree relation is |V|-sized); the five
    moments are EXACT integer sums in one map-side-combinable agg,
    and the final Pearson formula runs once on the 1-row moment
    relation — identical op order on both engines, so round-6 is
    deterministic despite the double math."""
    e = _undirected_edges(spark, sf_dir)
    deg = e.groupBy("src").agg(F.count(F.lit(1)).cast("long").alias("d"))
    ed = (
        e.join(
            F.broadcast(deg.select(F.col("src"), F.col("d").alias("x"))),
            "src",
        )
        .join(
            F.broadcast(
                deg.select(F.col("src").alias("dst"), F.col("d").alias("y"))
            ),
            "dst",
        )
        .select("x", "y")
    )
    s = ed.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("x").cast("long").alias("sx"),
        F.sum("y").cast("long").alias("sy"),
        F.sum(F.col("x") * F.col("x")).cast("long").alias("sxx"),
        F.sum(F.col("y") * F.col("y")).cast("long").alias("syy"),
        F.sum(F.col("x") * F.col("y")).cast("long").alias("sxy"),
    )
    nd = F.col("n").cast("double")
    # a REGULAR graph (every degree equal) has zero variance on both
    # endpoint-degree columns: Pearson is undefined and the division
    # would ERROR under ANSI mode (inf in DuckDB) — short-circuit to
    # NULL on the exact-integer variance test, same as drift_chi2
    degen = (
        F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx") == 0
    ) | (F.col("n") * F.col("syy") - F.col("sy") * F.col("sy") == 0)
    return s.select(
        F.col("n").alias("n_directed_edges"),
        F.when(degen, F.lit(None))
        .otherwise(
            F.round(
                (nd * F.col("sxy") - F.col("sx").cast("double") * F.col("sy"))
                / F.sqrt(
                    (nd * F.col("sxx") - F.col("sx").cast("double") * F.col("sx"))
                    * (
                        nd * F.col("syy")
                        - F.col("sy").cast("double") * F.col("sy")
                    )
                ),
                6,
            )
        )
        .alias("assortativity"),
    )


@q(
    "kg_entity_card",
    f"""
    WITH {_GRAMS_SQL},
    {_DOCENT_SQL},
    w AS (SELECT a.uri AS uri_a, b.uri AS uri_b, COUNT(*) AS n_ab
          FROM de a JOIN de b ON a.doc_id = b.doc_id AND a.uri < b.uri
          GROUP BY 1, 2),
    e AS (SELECT uri_a AS uri, uri_b AS nbr, n_ab FROM w
          UNION ALL SELECT uri_b, uri_a, n_ab FROM w),
    deg AS (SELECT uri, CAST(COUNT(*) AS BIGINT) AS degree,
                   CAST(SUM(n_ab) AS BIGINT) AS strength
            FROM e GROUP BY uri),
    rk AS (SELECT uri, nbr,
                  ROW_NUMBER() OVER (PARTITION BY uri
                                     ORDER BY n_ab DESC, nbr) AS r
           FROM e),
    top AS (SELECT uri, string_agg(nbr, ',' ORDER BY r) AS top_related
            FROM rk WHERE r <= 3 GROUP BY uri)
    SELECT deg.uri, deg.degree, deg.strength, top.top_related
    FROM deg JOIN top ON top.uri = deg.uri
    """,
)
def kg_entity_card(spark, sf_dir):
    """The SERVING view: one row per entity carrying degree, total
    co-occurrence strength, and its top-3 related entities as a
    comma-joined, deterministically ordered string — the
    related-entity panel a knowledge-panel API reads precomputed
    (never at request time). Top-k per entity is the WindowGroupLimit
    shape (rank partitioned by the entity, pushed-down r <= 3 — the
    same plan the audit pins for win_topk); the ranked survivors are
    re-assembled with array_sort over (rank, nbr) structs before
    joining, because collect_list order is NOT deterministic in a
    distributed agg — sorting by the carried rank is what makes the
    card reproducible. Strings instead of arrays on the gate (engine
    list formatting differs; CSV-joined cells hash identically)."""
    de = _doc_entities(spark, sf_dir)
    w = (
        de.alias("a")
        .join(de.alias("b"), "doc_id")
        .filter(F.col("a.uri") < F.col("b.uri"))
        .groupBy(
            F.col("a.uri").alias("uri_a"), F.col("b.uri").alias("uri_b")
        )
        .agg(F.count(F.lit(1)).alias("n_ab"))
    )
    e = w.select(
        F.col("uri_a").alias("uri"), F.col("uri_b").alias("nbr"), "n_ab"
    ).unionByName(
        w.select(
            F.col("uri_b").alias("uri"), F.col("uri_a").alias("nbr"), "n_ab"
        )
    )
    deg = e.groupBy("uri").agg(
        F.count(F.lit(1)).cast("long").alias("degree"),
        F.sum("n_ab").cast("long").alias("strength"),
    )
    rw = Window.partitionBy("uri").orderBy(F.desc("n_ab"), "nbr")
    top = (
        e.withColumn("r", F.row_number().over(rw))
        .filter(F.col("r") <= 3)
        .groupBy("uri")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct(F.col("r"), F.col("nbr")))
                    ),
                    lambda x: x["nbr"],
                ),
                ",",
            ).alias("top_related")
        )
    )
    return deg.join(top, "uri")


@q(
    "pyds_nt_source",
    f"""
    WITH {_GRAMS_SQL},
    cand AS (
      SELECT g.doc_id, g.pos, g.sf AS surface_form, d.uri, d.w
      FROM grams g JOIN {_DICT_SQL} ON g.sf = d.sf),
    best AS (
      SELECT doc_id, pos, surface_form, uri,
             row_number() OVER (PARTITION BY doc_id, pos, surface_form
                                ORDER BY w DESC, uri) AS rn
      FROM cand),
    ann AS (SELECT DISTINCT doc_id, uri FROM best WHERE rn = 1)
    SELECT 'http://dbpedia.org/ontology/mentions' AS pred,
           CAST(COUNT(*) AS BIGINT) AS n_triples,
           CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs,
           CAST(COUNT(DISTINCT uri) AS BIGINT) AS n_entities
    FROM ann
    """,
)
def pyds_nt_source(spark, sf_dir):
    """Spark 4 PYTHON DATA SOURCE API on the gate: the annotation set
    is serialized to an N-Triples dump (the kg_export_nt sink), then
    read back through the from-scratch `format("ntriples")` data
    source (`sources/nt_datasource.py`) — a file-per-InputPartition
    reader whose parse loop runs on the executors — and rolled up.
    The oracle computes the same rollup relationally, so a green hash
    proves the custom source parses the sink's output losslessly.
    This is the extension path for the one crawl feed that never has
    a JVM connector; the JVM-regex read_nt_triples (S3) stays the
    hot path for formats Spark can scan natively."""
    from ..sources import nt_datasource
    from .qio import _sink_dir

    d = _sink_dir(spark, "nt")
    Q["kg_export_nt"](spark, sf_dir).write.mode("overwrite").text(d)
    nt_datasource.register(spark)
    tri = spark.read.format("ntriples").load(d)
    return tri.groupBy("pred").agg(
        F.count(F.lit(1)).cast("long").alias("n_triples"),
        F.countDistinct("subj").cast("long").alias("n_docs"),
        F.countDistinct("obj").cast("long").alias("n_entities"),
    )


# memory-sink query names are session-global: a fresh name per call
# (the qrel._STREAM_Q_COUNTER convention)
_PYDS_STREAM_COUNTER = _itertools.count()


@q(
    "stream_pyds_nt",
    f"""
    WITH {_GRAMS_SQL},
    cand AS (
      SELECT g.doc_id, g.pos, g.sf AS surface_form, d.uri, d.w
      FROM grams g JOIN {_DICT_SQL} ON g.sf = d.sf),
    best AS (
      SELECT doc_id, pos, surface_form, uri,
             row_number() OVER (PARTITION BY doc_id, pos, surface_form
                                ORDER BY w DESC, uri) AS rn
      FROM cand),
    ann AS (SELECT DISTINCT doc_id, uri FROM best WHERE rn = 1)
    SELECT 'http://dbpedia.org/ontology/mentions' AS pred,
           CAST(COUNT(*) AS BIGINT) AS n_triples,
           CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs,
           CAST(COUNT(DISTINCT uri) AS BIGINT) AS n_entities
    FROM ann
    """,
)
def stream_pyds_nt(spark, sf_dir):
    """Spark 4 Python Data Source API, STREAMING flavor, on the full
    gate: the same NT dump as pyds_nt_source is consumed through the
    from-scratch source's ``DataSourceStreamReader``
    (`sources/nt_datasource.py::NTriplesStreamReader`) — offsets are
    positions in the sorted file listing, each micro-batch fans out
    one InputPartition per new file, and the shared parse loop runs
    on the executors (NOT the driver-side Simple reader variant —
    at feed scale the driver must only ever see the file LIST). A
    bounded replay drains the whole directory, so the memory-sink
    row set equals the batch read and the oracle is the identical
    relational rollup — a green hash proves the streaming offset
    path loses and duplicates nothing. This completes the custom-
    source family: batch (pyds_nt_source) and incremental feed
    (this face) through ONE registered format."""
    import os
    import tempfile

    from ..sources import nt_datasource
    from .qio import _sink_dir

    d = _sink_dir(spark, "ntstream")
    Q["kg_export_nt"](spark, sf_dir).write.mode("overwrite").text(d)
    nt_datasource.register(spark)
    name = f"stream_pyds_nt_{next(_PYDS_STREAM_COUNTER)}"
    with tempfile.TemporaryDirectory(prefix="ntstream_ckpt_") as tmp:
        q_ = (
            spark.readStream.format("ntriples")
            .load(d)
            .writeStream.format("memory")
            .queryName(name)
            .outputMode("append")
            .option("checkpointLocation", os.path.join(tmp, "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q_.awaitTermination()
    tri = spark.table(name)
    return tri.groupBy("pred").agg(
        F.count(F.lit(1)).cast("long").alias("n_triples"),
        F.countDistinct("subj").cast("long").alias("n_docs"),
        F.countDistinct("obj").cast("long").alias("n_entities"),
    )


# per-round frontier cap for kg_ppr: sparse PPR's bound on how many
# (uri, rank) rows survive each power-iteration round. Without it, a
# hub seed whose 1-hop ball is graph-sized makes the broadcast frontier
# unbounded (r3 VERDICT "What's wrong" #3). Selection ranks on the
# ROUNDED rank (round-6 — the cross-engine float-parity unit) with a
# uri tie-break, so the kept set is a total order both engines agree
# on; the rank values that flow into the next round stay full-precision
# per the kg_pagerank parity precedent.
PPR_FRONTIER_K = 1000

@q(
    "kg_ppr",
    f"""
    WITH {_GRAMS_SQL},
    {_DOCENT_SQL},
    {_PAIRS_SQL},
    {_UEDGES_SQL},
    deg AS (SELECT src, COUNT(*) AS d FROM e GROUP BY src),
    seed AS (SELECT MIN(src) AS s FROM e),
    r0 AS (SELECT s AS uri, CAST(1.0 AS DOUBLE) AS r FROM seed),
    c1 AS (SELECT e.dst AS uri, SUM(0.85 * r0.r / deg.d) AS r
           FROM r0
           JOIN deg ON deg.src = r0.uri
           JOIN e ON e.src = r0.uri
           GROUP BY e.dst),
    r1u AS (SELECT uri, SUM(r) AS r FROM (
             SELECT uri, r FROM c1
             UNION ALL SELECT s, CAST(0.15 AS DOUBLE) FROM seed) u
           GROUP BY uri),
    r1 AS (SELECT uri, r FROM r1u
           ORDER BY round(r, 6) DESC, uri LIMIT {PPR_FRONTIER_K}),
    c2 AS (SELECT e.dst AS uri, SUM(0.85 * r1.r / deg.d) AS r
           FROM r1
           JOIN deg ON deg.src = r1.uri
           JOIN e ON e.src = r1.uri
           GROUP BY e.dst),
    r2u AS (SELECT uri, SUM(r) AS r FROM (
             SELECT uri, r FROM c2
             UNION ALL SELECT s, CAST(0.15 AS DOUBLE) FROM seed) u
           GROUP BY uri),
    r2 AS (SELECT uri, r FROM r2u
           ORDER BY round(r, 6) DESC, uri LIMIT {PPR_FRONTIER_K})
    SELECT uri, round(r, 6) AS ppr FROM r2
    """,
)
def kg_ppr(spark, sf_dir):
    """PERSONALIZED PageRank: 2 unrolled power-iteration rounds with
    the teleport vector concentrated on one seed entity (the
    lexicographic minimum — deterministic) — the related-to-THIS-
    entity salience behind entity-centric recommendation panels,
    versus kg_pagerank's global salience. The rank vector stays
    SPARSE and BOUNDED: each round ends with a top-PPR_FRONTIER_K
    truncation by contribution (standard sparse-PPR practice) so a
    hub seed whose neighborhood is graph-sized can never grow the
    broadcast frontier past K rows — Spark plans the cap as
    TakeOrderedAndProject (per-partition partial top-k, no global
    sort, no single-partition window). Each round is a broadcast of
    the <=K-row rank relation joined to the edge list plus a
    map-side-combinable sum, with the teleport row folded in by
    UNION ALL + re-aggregate — NOT a full-outer join, which Spark
    cannot broadcast (it planned a SortMergeJoin of a 1-row
    relation); the union'd sum has at most two operands per key, and
    two-operand fp addition is commutative, so engine parity holds.
    The truncation ranks on round-6 values with a uri tie-break
    (total order, engine-stable — the doc_tfidf_topterms trick);
    full-precision ranks flow into the next round per the
    kg_pagerank parity precedent."""
    e = _undirected_edges(spark, sf_dir)
    r2 = _ppr_two_rounds(e, k=PPR_FRONTIER_K)
    return r2.select("uri", F.round("r", 6).alias("ppr"))


def _ppr_two_rounds(e, k):
    """2 unrolled sparse-PPR rounds over an undirected edge list
    (src, dst), teleporting to the lexicographic-min source, with the
    frontier truncated to the top-k ranks after every round (see
    kg_ppr's docstring for the parity and plan-shape contract)."""
    deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("d"))
    seed = e.agg(F.min("src").alias("s"))

    def ppr_round(r):
        contrib = (
            F.broadcast(r)
            .join(deg, r["uri"] == deg["src"])
            .drop("src")
            .join(e, r["uri"] == e["src"])
            .groupBy(F.col("dst").alias("uri"))
            .agg(F.sum(F.lit(0.85) * F.col("r") / F.col("d")).alias("r"))
        )
        tele = seed.select(F.col("s").alias("uri"), F.lit(0.15).alias("r"))
        summed = contrib.unionByName(tele).groupBy("uri").agg(
            F.sum("r").alias("r")
        )
        return summed.orderBy(
            F.round("r", 6).desc(), "uri"
        ).limit(k)

    r0 = seed.select(F.col("s").alias("uri"), F.lit(1.0).alias("r"))
    return ppr_round(ppr_round(r0))


@q(
    "kg_adamic_adar",
    f"""
    WITH {_GRAMS_SQL},
    {_DOCENT_SQL},
    {_PAIRS_SQL},
    {_UEDGES_SQL},
    {_CEDGES_SQL},
    deg AS (SELECT src, COUNT(*) AS d FROM e GROUP BY src),
    w AS (SELECT e1.src AS ua, e2.src AS ub, e1.dst AS z
          FROM ce e1 JOIN ce e2 ON e1.dst = e2.dst AND e1.src < e2.src),
    nw AS (SELECT w.ua, w.ub, w.z FROM w
           WHERE NOT EXISTS (SELECT 1 FROM p
                             WHERE p.uri_a = w.ua AND p.uri_b = w.ub)),
    s AS (SELECT nw.ua, nw.ub, COUNT(*) AS n_common,
                 SUM(CAST(round(1000000.0 / ln(deg.d), 0) AS BIGINT)) AS aa_us
          FROM nw JOIN deg ON deg.src = nw.z
          GROUP BY nw.ua, nw.ub)
    SELECT ua AS uri_a, ub AS uri_b, CAST(n_common AS BIGINT) AS n_common,
           round(CAST(aa_us AS DOUBLE) / 1000000.0, 6) AS aa_score
    FROM s
    """,
)
def kg_adamic_adar(spark, sf_dir):
    """Adamic-Adar link prediction over the co-occurrence graph:
    for every NON-adjacent entity pair with at least one common
    neighbor, AA(a,b) = sum over common neighbors z of 1/ln(deg(z)) —
    the classic missing-link score that weights rare shared neighbors
    above hubs (the KG-completion counterpart to kg_node_sim, which
    refines pairs that are already edges). The wedge self-join keyed
    on the shared neighbor generates candidates; existing edges drop
    out via an UNHINTED anti-join (the survivors precedent — the pair
    relation is O(|E|) and must stay shuffle-joinable at web scale);
    the |V|-sized degree marginals attach UNHINTED too (AQE
    broadcasts iff they fit — the vocabulary-broadcast lesson).
    A wedge center always has degree >= 2, so ln(d) > 0 — no
    divide-by-zero surface even under ANSI. Engine parity: each term
    is quantized to integer MICROS (round(1e6/ln d) as BIGINT) before
    the SUM, so the aggregate is an order-independent exact integer
    sum on both engines (the kg_assortativity exact-moments trick) —
    no float-summation-order hazard. Scale shape: wedge fan-out is
    quadratic in hub degree, so the wedge join runs on the
    deg <= 64 (KG_WEDGE_DEG_CAP) induced subgraph (``_capped_edges``,
    cap mirrored in the DuckDB twin — dedup_jaccard's df-cap /
    kg_squares precedent, operators/dedup.py:201); dropping
    hub-mediated wedges is the standard AA approximation since hub
    terms contribute least (1/ln d), while the TERM degrees stay the
    FULL-graph degrees. Fixture graph is hub-free: cap never binds at
    test scale."""
    e = _undirected_edges(spark, sf_dir)
    ce = _capped_edges(e)
    p = _entity_pairs(spark, sf_dir)
    deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("d"))
    w = (
        ce.alias("e1")
        .join(
            ce.alias("e2"),
            (F.col("e1.dst") == F.col("e2.dst"))
            & (F.col("e1.src") < F.col("e2.src")),
        )
        .select(
            F.col("e1.src").alias("uri_a"),
            F.col("e2.src").alias("uri_b"),
            F.col("e1.dst").alias("z"),
        )
    )
    nw = w.join(p, ["uri_a", "uri_b"], "left_anti")
    term_us = F.round(F.lit(1000000.0) / F.log(F.col("d")), 0).cast("long")
    return (
        nw.join(deg.withColumnRenamed("src", "z"), "z")
        .groupBy("uri_a", "uri_b")
        .agg(
            F.count(F.lit(1)).alias("n_common"),
            F.sum(term_us).alias("aa_us"),
        )
        .select(
            "uri_a",
            "uri_b",
            "n_common",
            F.round(F.col("aa_us").cast("double") / 1000000.0, 6).alias(
                "aa_score"
            ),
        )
    )


@q(
    "kg_kcore",
    f"""
    WITH {_GRAMS_SQL},
    {_DOCENT_SQL},
    {_PAIRS_SQL},
    {_UEDGES_SQL},
    d0 AS (SELECT src, COUNT(*) AS d FROM e GROUP BY src),
    k0 AS (SELECT src FROM d0 WHERE d >= 2),
    e1 AS (SELECT e.src, e.dst FROM e
           WHERE e.src IN (SELECT src FROM k0)
             AND e.dst IN (SELECT src FROM k0)),
    d1 AS (SELECT src, COUNT(*) AS d FROM e1 GROUP BY src),
    k1 AS (SELECT src FROM d1 WHERE d >= 2),
    e2 AS (SELECT e1.src, e1.dst FROM e1
           WHERE e1.src IN (SELECT src FROM k1)
             AND e1.dst IN (SELECT src FROM k1)),
    d2 AS (SELECT src, COUNT(*) AS d FROM e2 GROUP BY src)
    SELECT src AS uri, CAST(d AS BIGINT) AS core_deg FROM d2
    """,
)
def kg_kcore(spark, sf_dir):
    """2-core decomposition, 2 unrolled peeling rounds: repeatedly
    drop nodes of degree < 2 and recompute degrees on the induced
    subgraph — the graph-sparsification step that strips pendant
    entities (one-document tails) off the co-occurrence graph before
    expensive community/centrality passes, keeping only the cohesive
    core. Each round is one map-side-combinable degree count plus two
    LEFT SEMI joins of the edge list against the |V|-sized keep set
    (unhinted — AQE broadcasts the keep set when it fits, shuffles
    when a web-scale core doesn't); unrolling 2 rounds keeps the
    DuckDB twin plain SQL per the kg_labelprop / embed_kmeans
    iterative-algorithm precedent, and at fixpoint scale the loop
    inherits the same convergence remedy as the CC operator. Output
    is the surviving nodes with their residual degree — exact
    integers, no parity hazard."""
    e = _undirected_edges(spark, sf_dir)

    def peel(edges):
        deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("d"))
        keep = deg.filter(F.col("d") >= 2).select("src")
        return edges.join(keep, "src", "left_semi").join(
            keep.withColumnRenamed("src", "dst"), "dst", "left_semi"
        )

    e2 = peel(peel(e))
    return e2.groupBy(F.col("src").alias("uri")).agg(
        F.count(F.lit(1)).alias("core_deg")
    )


@q(
    "kg_modularity",
    f"""
    WITH {_GRAMS_SQL},
    {_DOCENT_SQL},
    {_PAIRS_SQL},
    {_UEDGES_SQL},
    {_LPA_SQL},
    deg AS (SELECT src, COUNT(*) AS d FROM e GROUP BY src),
    m AS (SELECT COUNT(*) AS m FROM p),
    ie AS (SELECT la.community AS community, COUNT(*) AS internal
           FROM p
           JOIN l2 la ON la.uri = p.uri_a
           JOIN l2 lb ON lb.uri = p.uri_b AND lb.community = la.community
           GROUP BY la.community),
    ds AS (SELECT l2.community, COUNT(*) AS n_nodes,
                  SUM(COALESCE(deg.d, 0)) AS degree_sum
           FROM l2 LEFT JOIN deg ON deg.src = l2.uri
           GROUP BY l2.community)
    SELECT ds.community, CAST(ds.n_nodes AS BIGINT) AS n_nodes,
           CAST(COALESCE(ie.internal, 0) AS BIGINT) AS internal_edges,
           CAST(ds.degree_sum AS BIGINT) AS degree_sum,
           CASE WHEN m.m = 0 THEN NULL
                ELSE round(CAST(COALESCE(ie.internal, 0) AS DOUBLE) / m.m
                           - (CAST(ds.degree_sum AS DOUBLE) / (2 * m.m))
                             * (CAST(ds.degree_sum AS DOUBLE) / (2 * m.m)),
                           6)
           END AS q_contrib
    FROM ds LEFT JOIN ie ON ie.community = ds.community
    CROSS JOIN m
    """,
)
def kg_modularity(spark, sf_dir):
    """Newman modularity report for the kg_labelprop communities:
    per community c, Q_c = e_c/m - (d_c/2m)^2 where e_c = internal
    edge count, d_c = degree sum, m = total undirected edges — the
    quality gate on community detection (sum(Q_c) is the graph's
    modularity; a partition worth keeping scores well above the
    random-graph null this formula subtracts). Reuses the exact
    2-round LPA assignment via the shared _LPA_SQL / _lpa_two_rounds
    pair so the two faces can never drift. Plan shape: communities
    and degrees are |V|-sized relations joined to the O(|E|) pair
    list, then everything collapses to an O(#communities) report;
    the one-row edge total attaches by broadcast cross join. Engine
    parity: counts and degree sums are exact integers; the two
    divisions and one multiply happen in the IDENTICAL order on both
    engines (drift_chi2 precedent), round 6. The m = 0 guard
    (all-singleton communities, zero edges) short-circuits to NULL —
    Spark ANSI throws DIVIDE_BY_ZERO where DuckDB yields inf, the
    kg_assortativity degenerate-input precedent."""
    e = _undirected_edges(spark, sf_dir)
    p = _entity_pairs(spark, sf_dir)
    nodes = _doc_entities(spark, sf_dir).select("uri").distinct()
    comm = _lpa_two_rounds(e, nodes)
    deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("d"))
    m = p.agg(F.count(F.lit(1)).alias("m"))
    ie = (
        p.join(
            comm.select(F.col("uri").alias("uri_a"), "community"), "uri_a"
        )
        .join(
            comm.select(
                F.col("uri").alias("uri_b"),
                F.col("community").alias("community_b"),
            ),
            "uri_b",
        )
        .filter(F.col("community") == F.col("community_b"))
        .groupBy("community")
        .agg(F.count(F.lit(1)).alias("internal"))
    )
    ds = (
        comm.join(deg, comm["uri"] == deg["src"], "left")
        .groupBy("community")
        .agg(
            F.count(F.lit(1)).alias("n_nodes"),
            F.sum(F.coalesce("d", F.lit(0))).alias("degree_sum"),
        )
    )
    internal = F.coalesce("internal", F.lit(0)).cast("double")
    half_ratio = F.col("degree_sum").cast("double") / (2 * F.col("m"))
    return (
        ds.join(ie, "community", "left")
        .crossJoin(F.broadcast(m))
        .select(
            "community",
            "n_nodes",
            F.coalesce("internal", F.lit(0)).cast("long").alias(
                "internal_edges"
            ),
            "degree_sum",
            F.when(F.col("m") == 0, F.lit(None).cast("double"))
            .otherwise(
                F.round(
                    internal / F.col("m") - half_ratio * half_ratio, 6
                )
            )
            .alias("q_contrib"),
        )
    )


@q(
    "kg_truss",
    f"""
    WITH {_GRAMS_SQL},
    {_DOCENT_SQL},
    {_PAIRS_SQL},
    {_UEDGES_SQL},
    sup1 AS (SELECT pp.uri_a, pp.uri_b, COUNT(*) AS s
             FROM p pp
             JOIN e e1 ON e1.src = pp.uri_a
             JOIN e e2 ON e2.src = pp.uri_b AND e2.dst = e1.dst
             GROUP BY pp.uri_a, pp.uri_b),
    p1 AS (SELECT uri_a, uri_b FROM sup1 WHERE s >= 1),
    e1s AS (SELECT uri_a AS src, uri_b AS dst FROM p1
            UNION ALL SELECT uri_b, uri_a FROM p1),
    sup2 AS (SELECT pp.uri_a, pp.uri_b, COUNT(*) AS s
             FROM p1 pp
             JOIN e1s e1 ON e1.src = pp.uri_a
             JOIN e1s e2 ON e2.src = pp.uri_b AND e2.dst = e1.dst
             GROUP BY pp.uri_a, pp.uri_b)
    SELECT uri_a, uri_b, CAST(s AS BIGINT) AS support
    FROM sup2 WHERE s >= 1
    """,
)
def kg_truss(spark, sf_dir):
    """3-truss edge filter, 2 unrolled peeling rounds: keep only
    edges supported by at least one triangle, recompute support on
    the induced subgraph, filter again — the EDGE-level counterpart
    of kg_kcore's node peeling, and the standard cohesion filter
    that strips coincidental co-occurrence edges (two entities that
    shared one document but no third witness) before community or
    relatedness passes. Per round, edge support = common-neighbor
    count via the same wedge join as kg_node_sim, keyed on the
    shared endpoint; support and filter are map-side-combinable agg
    + filter, and the subgraph induction is a projection of the
    surviving pair list (no node-side state at all). Unrolling keeps
    the DuckDB twin plain SQL (kg_labelprop precedent); exact
    integer supports, no parity surface. Scale shape: wedge fan-out
    is hub-degree-quadratic and inherits dedup_jaccard's df-cap
    remedy at corpus scale; each round's joins are unhinted
    shuffle joins on node keys."""
    p = _entity_pairs(spark, sf_dir)

    def edges_of(pairs):
        return pairs.select(
            F.col("uri_a").alias("src"), F.col("uri_b").alias("dst")
        ).unionByName(
            pairs.select(
                F.col("uri_b").alias("src"), F.col("uri_a").alias("dst")
            )
        )

    def support(pairs):
        e = edges_of(pairs)
        return (
            pairs.join(
                e.alias("e1"), pairs["uri_a"] == F.col("e1.src")
            )
            .join(
                e.alias("e2"),
                (pairs["uri_b"] == F.col("e2.src"))
                & (F.col("e2.dst") == F.col("e1.dst")),
            )
            .groupBy("uri_a", "uri_b")
            .agg(F.count(F.lit(1)).alias("s"))
        )

    p1 = support(p).filter(F.col("s") >= 1).select("uri_a", "uri_b")
    return (
        support(p1)
        .filter(F.col("s") >= 1)
        .select("uri_a", "uri_b", F.col("s").alias("support"))
    )


# ---------------------------------------------------------------------------
# recursive-CTE reachability (Spark 4 WITH RECURSIVE)
# ---------------------------------------------------------------------------
@q(
    "kg_reach_recursive",
    f"""
    WITH RECURSIVE {_GRAMS_SQL},
    {_DOCENT_SQL},
    {_PAIRS_SQL},
    {_UEDGES_SQL},
    s AS (SELECT MIN(uri) AS uri FROM de),
    r(uri, dist) AS (
      SELECT uri, 0 AS dist FROM s
      UNION ALL
      SELECT e.dst, r.dist + 1
      FROM r JOIN e ON e.src = r.uri
      WHERE r.dist < 3
    )
    SELECT uri, CAST(MIN(dist) AS INT) AS dist FROM r GROUP BY uri
    """,
)
def kg_reach_recursive(spark, sf_dir):
    """Bounded reachability from the lexicographically-first entity
    expressed as a RECURSIVE CTE (Spark 4's WITH RECURSIVE /
    UnionLoop operator) instead of kg_shortest_path's hand-unrolled
    hop joins — the declarative iterative-graph face, and the one
    engine execution surface (recursion) no other key exercised. The
    two faces compute the SAME (uri, min dist) relation over the same
    edge list, so together they pin that the engine's recursion
    semantics (re-feed the previous iteration's rows, depth-guard in
    the recursive term, UNION ALL accumulation) match the explicit
    frontier algebra; the DuckDB twin is the identical recursive SQL.
    Scale shape: each iteration is one frontier-keyed equi-join
    against the edge list — exactly the unrolled plan's shape, with
    the engine owning loop control. UNION ALL recursion enumerates
    WALKS, not nodes (the min-agg collapses them), so production runs
    at depth bounds like this one, or dedups the frontier per round
    as operators/closure.py's pointer jumping does; the declarative
    form's value is resumable loop control inside one query."""
    e = _undirected_edges(spark, sf_dir)
    de = _doc_entities(spark, sf_dir)
    e.createOrReplaceTempView("rec_edges")
    de.agg(F.min("uri").alias("uri")).createOrReplaceTempView("rec_seed")
    return spark.sql(
        """
        WITH RECURSIVE r(uri, dist) AS (
          SELECT uri, 0 AS dist FROM rec_seed
          UNION ALL
          SELECT e.dst, r.dist + 1
          FROM r JOIN rec_edges e ON e.src = r.uri
          WHERE r.dist < 3
        )
        SELECT uri, CAST(MIN(dist) AS INT) AS dist FROM r GROUP BY uri
        """
    )


@q(
    "pyds_nt_sink",
    f"""
    WITH {_GRAMS_SQL},
    cand AS (
      SELECT g.doc_id, g.pos, g.sf AS surface_form, d.uri, d.w
      FROM grams g JOIN {_DICT_SQL} ON g.sf = d.sf),
    best AS (
      SELECT doc_id, pos, surface_form, uri,
             row_number() OVER (PARTITION BY doc_id, pos, surface_form
                                ORDER BY w DESC, uri) AS rn
      FROM cand),
    ann AS (SELECT DISTINCT doc_id, uri FROM best WHERE rn = 1)
    SELECT 'http://dbpedia.org/ontology/mentions' AS pred,
           CAST(COUNT(*) AS BIGINT) AS n_triples,
           CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs,
           CAST(COUNT(DISTINCT uri) AS BIGINT) AS n_entities
    FROM ann
    """,
)
def pyds_nt_sink(spark, sf_dir):
    """The WRITE half of the Python Data Source API (Spark 4
    ``DataSourceWriter``) on the gate: the annotation triples are
    written through ``format("ntriples")`` — each task streams its
    partition straight to one part file on the executors (lazy file
    open, so empty partitions write nothing; per-task commit
    messages; driver-side commit writes the _SUCCESS manifest; abort
    removes orphans) — then read back through the SAME source's
    reader and rolled up against the relational oracle. A green hash
    proves the full Python write→read round trip is lossless, which
    is the contract a custom export feed (the one format nobody has
    a JVM sink for) must satisfy before a 10^12-triple dump job
    trusts it. pyds_nt_source covers the reader over a JVM-written
    dump; this face is its inverse."""
    from ..sources import nt_datasource
    from .qio import _sink_dir

    ann = kg_annotate_prior(spark, sf_dir).select("doc_id", "uri").distinct()
    tri = ann.select(
        F.concat(F.lit("doc://"), F.col("doc_id").cast("string")).alias(
            "subj"
        ),
        F.lit("http://dbpedia.org/ontology/mentions").alias("pred"),
        F.col("uri").alias("obj"),
    )
    d = _sink_dir(spark, "pyds_nt_sink")
    nt_datasource.register(spark)
    tri.write.format("ntriples").mode("overwrite").save(d)
    back = spark.read.format("ntriples").load(d)
    return back.groupBy("pred").agg(
        F.count(F.lit(1)).cast("long").alias("n_triples"),
        F.countDistinct("subj").cast("long").alias("n_docs"),
        F.countDistinct("obj").cast("long").alias("n_entities"),
    )


@q(
    "stream_pyds_sink",
    f"""
    WITH {_GRAMS_SQL},
    cand AS (
      SELECT g.doc_id, g.pos, g.sf AS surface_form, d.uri, d.w
      FROM grams g JOIN {_DICT_SQL} ON g.sf = d.sf),
    best AS (
      SELECT doc_id, pos, surface_form, uri,
             row_number() OVER (PARTITION BY doc_id, pos, surface_form
                                ORDER BY w DESC, uri) AS rn
      FROM cand),
    ann AS (SELECT DISTINCT doc_id, uri FROM best WHERE rn = 1)
    SELECT 'http://dbpedia.org/ontology/mentions' AS pred,
           CAST(COUNT(*) AS BIGINT) AS n_triples,
           CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs,
           CAST(COUNT(DISTINCT uri) AS BIGINT) AS n_entities
    FROM ann
    """,
)
def stream_pyds_sink(spark, sf_dir):
    """The LAST quadrant of the Python Data Source API surface —
    batch read (pyds_nt_source), batch write (pyds_nt_sink), stream
    read (stream_pyds_nt), and now the STREAMING WRITER
    (`DataSourceStreamWriter`,
    `sources/nt_datasource.py::NTriplesStreamWriter`): the NT dump
    flows through the custom source's stream READER, micro-batch by
    micro-batch, into the custom STREAM SINK — per-batch-tagged
    executor-side part files, a per-batch driver commit appending
    to the `_SUCCESS_STREAM` manifest, abort-time orphan cleanup —
    and the sink's directory is then read back through the batch
    reader and rolled up on the full DuckDB gate: a green hash
    proves the whole streaming write path (offsets → batches →
    task files → batch commit) loses and duplicates nothing. The
    availableNow bounded replay is the stream_pyds_nt convention
    (single-batch fallback on a Python source is documented and
    gate-safe)."""
    import os
    import tempfile

    from ..sources import nt_datasource
    from .qio import _sink_dir

    d = _sink_dir(spark, "ntsrc2")
    Q["kg_export_nt"](spark, sf_dir).write.mode("overwrite").text(d)
    nt_datasource.register(spark)
    out = _sink_dir(spark, "ntsink2")
    with tempfile.TemporaryDirectory(prefix="ntsinkckpt_") as tmp:
        q_ = (
            spark.readStream.format("ntriples")
            .load(d)
            .writeStream.format("ntriples")
            .option("path", out)
            .option("checkpointLocation", os.path.join(tmp, "ckpt"))
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q_.awaitTermination()
    tri = spark.read.format("ntriples").load(out)
    return tri.groupBy("pred").agg(
        F.count(F.lit(1)).cast("long").alias("n_triples"),
        F.countDistinct("subj").cast("long").alias("n_docs"),
        F.countDistinct("obj").cast("long").alias("n_entities"),
    )


# ---------------------------------------------------------------------------
# bounded harmonic centrality — distance-weighted 2-hop reach
# ---------------------------------------------------------------------------
@q(
    "kg_harmonic",
    f"""
    WITH {_GRAMS_SQL},
    {_DOCENT_SQL},
    {_PAIRS_SQL},
    {_UEDGES_SQL},
    {_CEDGES_SQL},
    two AS (SELECT e1.src, e2.dst FROM ce e1
            JOIN ce e2 ON e1.dst = e2.src WHERE e2.dst <> e1.src),
    d AS (SELECT src, dst, 1 AS dd FROM e
          UNION ALL SELECT src, dst, 2 FROM two),
    md AS (SELECT src, dst, MIN(dd) AS dd FROM d GROUP BY src, dst)
    SELECT src AS uri,
           CAST(SUM(CASE WHEN dd = 1 THEN 2 ELSE 1 END) AS BIGINT) AS h2x
    FROM md GROUP BY src
    """,
)
def kg_harmonic(spark, sf_dir):
    """Bounded harmonic centrality: per entity, sum of 1/d(u,v) over
    the 2-hop ball — the centrality that stays finite on DISCONNECTED
    graphs (closeness needs full reachability; harmonic just adds
    nothing for unreachable nodes), which is the web-KG regime where
    co-occurrence graphs are archipelagos. Distance classification is
    a min-distance fold over the union of the 1-hop edges (d=1) and
    the hop-join frontier (d=2) — kg_khop counts the SAME ball, this
    face weights it; kg_shortest_path's min-level agg is the same
    revisit-free discipline. Emitted DOUBLED (h2x = 2*n1 + n2) so the
    half-integer harmonic sum is an exact BIGINT agg, per the
    stat_mannwhitney doubled-rank trick. Scale shape: one frontier
    equi-join + two map-side-combinable aggs; the hop join runs on
    the deg <= 64 (KG_WEDGE_DEG_CAP) induced subgraph
    (``_capped_edges``, mirrored in the DuckDB twin — the jaccard
    df-cap precedent), and the fixture graph is hub-free so the face
    stays exact at test scale."""
    e = _undirected_edges(spark, sf_dir)
    ce = _capped_edges(e)
    two = (
        ce.alias("e1")
        .join(ce.alias("e2"), F.col("e1.dst") == F.col("e2.src"))
        .filter(F.col("e2.dst") != F.col("e1.src"))
        .select(F.col("e1.src").alias("src"), F.col("e2.dst").alias("dst"))
    )
    d = e.select("src", "dst", F.lit(1).alias("dd")).unionByName(
        two.select("src", "dst", F.lit(2).alias("dd"))
    )
    md = d.groupBy("src", "dst").agg(F.min("dd").alias("dd"))
    return md.groupBy(F.col("src").alias("uri")).agg(
        F.sum(F.when(F.col("dd") == 1, 2).otherwise(1))
        .cast("long")
        .alias("h2x")
    )


# ---------------------------------------------------------------------------
# 2-hop betweenness — shortest-path middle credit, exactly
# ---------------------------------------------------------------------------
@q(
    "kg_betweenness",
    f"""
    WITH {_GRAMS_SQL},
    {_DOCENT_SQL},
    {_PAIRS_SQL},
    {_UEDGES_SQL},
    {_CEDGES_SQL},
    wedge AS (
      SELECT e1.src AS u, e1.dst AS m, e2.dst AS w
      FROM ce e1 JOIN ce e2 ON e1.dst = e2.src
      WHERE e1.src < e2.dst),
    far AS (
      SELECT u, m, w FROM wedge
      WHERE NOT EXISTS (SELECT 1 FROM e
                        WHERE e.src = wedge.u AND e.dst = wedge.w)),
    credit AS (
      SELECT m, CAST(round(1000000.0
                 / COUNT(*) OVER (PARTITION BY u, w)) AS BIGINT) AS cr
      FROM far)
    SELECT m AS uri,
           CAST(COUNT(*) AS BIGINT) AS n_paths,
           CAST(SUM(cr) AS BIGINT) AS bc_micros
    FROM credit GROUP BY m
    """,
)
def kg_betweenness(spark, sf_dir):
    """Betweenness centrality restricted to length-2 shortest paths —
    the broker signal (who CONNECTS otherwise-unlinked entities),
    computed EXACTLY instead of by Brandes sampling: for every
    endpoint pair (u, w) at distance exactly 2 (wedge endpoints with
    NO direct edge — the anti-join makes the wedge a shortest path),
    each middle m splits the pair's unit credit 1/sigma(u,w).
    sigma is a COUNT window over the wedge relation itself (the
    stat_mutual_info marginals-as-windows rule — never a second
    aggregation branch re-scanning the wedges), each share is
    micros-quantized in the same expression on both engines, so the
    per-middle sum is an exact order-independent BIGINT agg
    (the kg_adamic_adar trick). Scale shape: one wedge equi-join on
    the deg <= 64 (KG_WEDGE_DEG_CAP) induced subgraph
    (``_capped_edges``, cap mirrored in the DuckDB twin — the
    jaccard df-cap / kg_squares precedent; brokers by definition sit
    on many shortest paths, but exact per-hub credit is what Brandes
    SAMPLING approximates at web scale anyway — the cap is the
    deterministic version of that tradeoff), one unhinted anti-join
    against the FULL edge set (distance-2 means no direct edge in
    the REAL graph, not the capped one), one window, one agg —
    kg_local_bridges finds edges that BRIDGE, this face scores the
    NODES doing the bridging."""
    e = _undirected_edges(spark, sf_dir)
    ce = _capped_edges(e)
    wedge = (
        ce.alias("e1")
        .join(ce.alias("e2"), F.col("e1.dst") == F.col("e2.src"))
        .filter(F.col("e1.src") < F.col("e2.dst"))
        .select(
            F.col("e1.src").alias("u"),
            F.col("e1.dst").alias("m"),
            F.col("e2.dst").alias("w"),
        )
    )
    far = wedge.join(
        e.select(F.col("src").alias("u"), F.col("dst").alias("w")),
        ["u", "w"],
        "left_anti",
    )
    sig = Window.partitionBy("u", "w")
    credit = far.select(
        "m",
        F.round(F.lit(1000000.0) / F.count(F.lit(1)).over(sig))
        .cast("long")
        .alias("cr"),
    )
    return credit.groupBy(F.col("m").alias("uri")).agg(
        F.count(F.lit(1)).cast("long").alias("n_paths"),
        F.sum("cr").cast("long").alias("bc_micros"),
    )


# ---------------------------------------------------------------------------
# eigenvector centrality — 2 exact power-iteration rounds
# ---------------------------------------------------------------------------
@q(
    "kg_eigenvector",
    f"""
    WITH {_GRAMS_SQL},
    {_DOCENT_SQL},
    {_PAIRS_SQL},
    {_UEDGES_SQL},
    deg AS (SELECT src AS uri, CAST(COUNT(*) AS BIGINT) AS d
            FROM e GROUP BY src),
    x2 AS (SELECT e.src AS uri, CAST(SUM(deg.d) AS BIGINT) AS s2
           FROM e JOIN deg ON deg.uri = e.dst
           GROUP BY e.src)
    SELECT uri, s2 AS x2,
           round(CAST(s2 AS DOUBLE) / MAX(s2) OVER (), 6) + 0 AS ev_norm
    FROM x2
    """,
)
def kg_eigenvector(spark, sf_dir):
    """Eigenvector centrality after two exact power-iteration rounds
    from the all-ones vector: x1 = A·1 is the degree, x2 = A·x1 is
    each entity's SUM OF NEIGHBOR DEGREES — the "connected to
    well-connected" signal that separates a hub's entourage from
    nodes with the same degree in a backwater (degree says how many
    friends; eigenvector says whether the friends matter — the
    kg_hits authority idea on the undirected graph). Both rounds are
    exact BIGINT aggs (integer matvec, nothing to quantize), so
    unlike the float-iterate textbook spelling the partial order of
    the sum can't leak into the hash. Per-round shape is one
    edge-list equi-join against the previous vector — the vector
    relation is vocab-sized and UNBOUNDED at web scale, so the join
    is unhinted (the text_unigram_lm lesson); more rounds are the
    same join repeated with the parquet_checkpoint discipline.
    The max-normalization (||x||_inf, the power-method convention)
    is a frameless window over the entity-sized result — never a
    second aggregation branch re-running the matvec (the
    stat_mutual_info rule) — and the s2/max ratio of two BIGINTs is
    one float division, round-6 exact on both engines."""
    e = _undirected_edges(spark, sf_dir)
    deg = e.groupBy(F.col("src").alias("uri")).agg(
        F.count(F.lit(1)).cast("long").alias("d")
    )
    x2 = (
        e.join(deg, e.dst == deg.uri)
        .groupBy(F.col("src").alias("u"))
        .agg(F.sum("d").cast("long").alias("s2"))
    )
    w = Window.partitionBy()
    return x2.select(
        F.col("u").alias("uri"),
        F.col("s2").alias("x2"),
        (
            F.round(F.col("s2").cast("double") / F.max("s2").over(w), 6)
            + F.lit(0.0)
        ).alias("ev_norm"),
    )


# ---------------------------------------------------------------------------
# rich-club coefficient — do the hubs talk to each other?
# ---------------------------------------------------------------------------
@q(
    "kg_rich_club",
    f"""
    WITH {_GRAMS_SQL},
    {_DOCENT_SQL},
    {_PAIRS_SQL},
    {_UEDGES_SQL},
    deg AS (SELECT src AS uri, CAST(COUNT(*) AS BIGINT) AS d
            FROM e GROUP BY src),
    em AS (SELECT LEAST(da.d, db.d) AS mm
           FROM e JOIN deg da ON da.uri = e.src
                  JOIN deg db ON db.uri = e.dst),
    nv AS (SELECT d AS v, CAST(COUNT(*) AS BIGINT) AS nn,
                  CAST(0 AS BIGINT) AS ee
           FROM deg GROUP BY d
           UNION ALL
           SELECT mm, CAST(0 AS BIGINT), CAST(COUNT(*) AS BIGINT)
           FROM em GROUP BY mm),
    cc AS (SELECT v, CAST(SUM(nn) AS BIGINT) AS nn,
                  CAST(SUM(ee) AS BIGINT) AS ee
           FROM nv GROUP BY v),
    w AS (
      SELECT v,
             SUM(nn) OVER ()
               - SUM(nn) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING)
               AS n_gt,
             SUM(ee) OVER ()
               - SUM(ee) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING)
               AS e2_gt
      FROM cc)
    SELECT CAST(v AS BIGINT) AS k,
           CAST(n_gt AS BIGINT) AS n_rich,
           CAST(e2_gt AS BIGINT) AS e2_rich,
           CASE WHEN n_gt < 2 THEN NULL
                ELSE round(e2_gt * 1.0 / (n_gt * (n_gt - 1)), 6) + 0
           END AS phi
    FROM w
    """,
)
def kg_rich_club(spark, sf_dir):
    """Rich-club coefficient phi(k) at every distinct degree
    threshold: among the nodes with degree > k, what fraction of
    possible links exists — the hubs-talk-to-each-other probe that
    separates a web-like core-periphery KG (phi rises with k) from a
    hub-and-spoke star (hubs share no edges; kg_assortativity gives
    one global correlation, this face gives the whole profile). An
    edge belongs to club k iff min(deg_u, deg_v) > k, so the corpus
    of edges collapses ONCE to a degree-keyed count-of-counts
    relation (per degree value v: nodes AT v, directed edges whose
    endpoint-min is AT v — union with zero-flags, the kg_delta
    reconciliation idiom) and every threshold's cumulative is a
    window over that degree-distribution-sized relation (the
    stat_gini closed-form discipline: NEVER per-threshold rescans).
    N_>k and the doubled edge count 2E_>k are exact BIGINTs; phi is
    one float division rounded to 6, NULL-guarded for clubs smaller
    than 2 (the ANSI DIVIDE_BY_ZERO hazard). The two endpoint-degree
    joins are unhinted (vocab-sized relation, the text_unigram_lm
    lesson)."""
    e = _undirected_edges(spark, sf_dir)
    deg = e.groupBy(F.col("src").alias("uri")).agg(
        F.count(F.lit(1)).cast("long").alias("d")
    )
    da = deg.select(F.col("uri").alias("ua"), F.col("d").alias("dda"))
    db = deg.select(F.col("uri").alias("ub"), F.col("d").alias("ddb"))
    em = (
        e.join(da, e.src == da.ua)
        .join(db, e.dst == db.ub)
        .select(F.least("dda", "ddb").alias("mm"))
    )
    nv = deg.groupBy(F.col("d").alias("v")).agg(
        F.count(F.lit(1)).cast("long").alias("nn"),
        F.lit(0).cast("long").alias("ee"),
    ).unionByName(
        em.groupBy(F.col("mm").alias("v")).agg(
            F.lit(0).cast("long").alias("nn"),
            F.count(F.lit(1)).cast("long").alias("ee"),
        )
    )
    cc = nv.groupBy("v").agg(
        F.sum("nn").cast("long").alias("nn"),
        F.sum("ee").cast("long").alias("ee"),
    )
    wall = Window.partitionBy()
    wcum = Window.orderBy("v").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    w = cc.select(
        "v",
        (F.sum("nn").over(wall) - F.sum("nn").over(wcum)).alias("n_gt"),
        (F.sum("ee").over(wall) - F.sum("ee").over(wcum)).alias("e2_gt"),
    )
    return w.select(
        F.col("v").cast("long").alias("k"),
        F.col("n_gt").cast("long").alias("n_rich"),
        F.col("e2_gt").cast("long").alias("e2_rich"),
        F.when(F.col("n_gt") < 2, F.lit(None).cast("double"))
        .otherwise(
            F.round(
                F.col("e2_gt")
                * F.lit(1.0)
                / (F.col("n_gt") * (F.col("n_gt") - 1)),
                6,
            )
            + F.lit(0.0)
        )
        .alias("phi"),
    )


# ---------------------------------------------------------------------------
# average-neighbor-degree profile — the disassortativity curve
# ---------------------------------------------------------------------------
@q(
    "kg_knn_profile",
    f"""
    WITH {_GRAMS_SQL},
    {_DOCENT_SQL},
    {_PAIRS_SQL},
    {_UEDGES_SQL},
    deg AS (SELECT src AS uri, CAST(COUNT(*) AS BIGINT) AS d
            FROM e GROUP BY src),
    ed AS (
      SELECT da.d AS du, db.d AS dv
      FROM e JOIN deg da ON da.uri = e.src
             JOIN deg db ON db.uri = e.dst)
    SELECT CAST(du AS BIGINT) AS k,
           CAST(COUNT(*) AS BIGINT) AS n_endpoints,
           CAST(SUM(dv) AS BIGINT) AS neigh_deg_sum,
           round(SUM(dv) * 1.0 / COUNT(*), 6) + 0 AS knn
    FROM ed GROUP BY du
    """,
)
def kg_knn_profile(spark, sf_dir):
    """The k-nn(k) profile: for each degree k, the mean degree of
    the neighbors of degree-k nodes — the full DISASSORTATIVITY
    CURVE behind kg_assortativity's single correlation (the web's
    signature is knn(k) FALLING in k: hubs attach to leaves; a
    social graph rises; a flat curve is neutral mixing — and the
    curve distinguishes shapes the scalar can't, e.g. mixed
    regimes that cancel to r ~ 0). Same two unhinted
    endpoint-degree joins as kg_rich_club (the degree relation is
    vocab-sized and unbounded at web scale); each DIRECTED edge
    contributes its source's k and its target's degree, so
    per-node weighting is automatic (a degree-k node appears k
    times — the standard edge-weighted knn definition); the profile
    is one exact-integer fold per degree value with a single float
    division at the end."""
    e = _undirected_edges(spark, sf_dir)
    deg = e.groupBy(F.col("src").alias("uri")).agg(
        F.count(F.lit(1)).cast("long").alias("d")
    )
    da = deg.select(F.col("uri").alias("ua"), F.col("d").alias("du"))
    db = deg.select(F.col("uri").alias("ub"), F.col("d").alias("dv"))
    ed = (
        e.join(da, e.src == da.ua)
        .join(db, e.dst == db.ub)
        .select("du", "dv")
    )
    return ed.groupBy(F.col("du").cast("long").alias("k")).agg(
        F.count(F.lit(1)).cast("long").alias("n_endpoints"),
        F.sum("dv").cast("long").alias("neigh_deg_sum"),
        (
            F.round(F.sum("dv") * F.lit(1.0) / F.count(F.lit(1)), 6)
            + F.lit(0.0)
        ).alias("knn"),
    )


# ---------------------------------------------------------------------------
# one-row graph summary — the KG's vital signs
# ---------------------------------------------------------------------------
@q(
    "kg_summary",
    f"""
    WITH {_GRAMS_SQL},
    {_DOCENT_SQL},
    {_PAIRS_SQL},
    {_UEDGES_SQL},
    deg AS (SELECT src AS uri, CAST(COUNT(*) AS BIGINT) AS d
            FROM e GROUP BY src)
    SELECT CAST(COUNT(*) AS BIGINT) AS n_nodes,
           CAST(SUM(d) / 2 AS BIGINT) AS n_edges,
           CAST(MAX(d) AS BIGINT) AS max_degree,
           round(SUM(d) * 1.0 / COUNT(*), 6) + 0 AS avg_degree,
           CASE WHEN COUNT(*) < 2 THEN NULL
                ELSE round(SUM(d) * 1.0
                           / (COUNT(*) * (COUNT(*) - 1)), 6) + 0
           END AS density
    FROM deg
    """,
)
def kg_summary(spark, sf_dir):
    """The KG's vital signs in one row: nodes, undirected edges,
    max and mean degree, and density — the first table a graph
    review reads and the sanity gate every downstream face's cost
    model hangs off (the wedge joins are Σd² work, the rich-club
    windows are degree-distribution-sized, the density says whether
    'broadcast the vocabulary' is even a sentence — and a density
    that JUMPS between snapshots means the extraction threshold
    moved, not the world; cf. kg_void_stats for the RDF-level
    census). One degree fold (the directed edge list halves to
    undirected edges exactly — every edge appears twice by
    construction), one singleton rollup, NULL-guarded density for
    the sub-2-node corpus."""
    e = _undirected_edges(spark, sf_dir)
    deg = e.groupBy(F.col("src").alias("uri")).agg(
        F.count(F.lit(1)).cast("long").alias("d")
    )
    n = F.count(F.lit(1))
    sd = F.sum("d")
    return deg.agg(
        n.cast("long").alias("n_nodes"),
        F.expr("CAST(SUM(d) / 2 AS BIGINT)").alias("n_edges"),
        F.max("d").cast("long").alias("max_degree"),
        (F.round(sd * F.lit(1.0) / n, 6) + F.lit(0.0)).alias("avg_degree"),
        F.when(n < 2, F.lit(None).cast("double"))
        .otherwise(
            F.round(sd * F.lit(1.0) / (n * (n - 1)), 6) + F.lit(0.0)
        )
        .alias("density"),
    )


# ---------------------------------------------------------------------------
# SimRank (2 iterations) — structural similarity on the capped subgraph
# ---------------------------------------------------------------------------
@q(
    "kg_simrank",
    f"""
    WITH {_GRAMS_SQL},
    {_DOCENT_SQL},
    {_PAIRS_SQL},
    {_UEDGES_SQL},
    {_CEDGES_SQL},
    degc AS (SELECT src, CAST(COUNT(*) AS BIGINT) AS d
             FROM ce GROUP BY src),
    cn AS (SELECT e1.src AS a, e2.src AS b,
                  CAST(COUNT(*) AS BIGINT) AS cn
           FROM ce e1 JOIN ce e2
             ON e1.dst = e2.dst AND e1.src < e2.src
           GROUP BY 1, 2),
    s1 AS (SELECT cn.a, cn.b,
                  (2 * 800000000000 * cn.cn + da.d * db.d)
                    // (2 * da.d * db.d) AS s_ps
           FROM cn
           JOIN degc da ON da.src = cn.a
           JOIN degc db ON db.src = cn.b),
    p2 AS (SELECT c.a, c.b, ea.dst AS i, eb.dst AS j
           FROM cn c
           JOIN ce ea ON ea.src = c.a
           JOIN ce eb ON eb.src = c.b),
    contrib AS (
      SELECT p2.a, p2.b,
             CASE WHEN p2.i = p2.j THEN 1000000000000
                  ELSE COALESCE(s1.s_ps, 0) END AS t_ps
      FROM p2 LEFT JOIN s1
        ON p2.i <> p2.j
           AND s1.a = least(p2.i, p2.j)
           AND s1.b = greatest(p2.i, p2.j)),
    tot AS (SELECT a, b, CAST(SUM(t_ps) AS BIGINT) AS total_ps
            FROM contrib GROUP BY a, b),
    s2 AS (SELECT tot.a, tot.b,
                  (8 * total_ps + 5 * da.d * db.d)
                    // (10 * da.d * db.d) AS s2_ps
           FROM tot
           JOIN degc da ON da.src = tot.a
           JOIN degc db ON db.src = tot.b)
    SELECT a AS uri_a, b AS uri_b,
           CAST(s2_ps AS BIGINT) AS s2_ps,
           round(s2_ps / 1000000000000.0, 6) + 0 AS simrank2
    FROM s2 ORDER BY s2_ps DESC, a, b LIMIT 20
    """,
)
def kg_simrank(spark, sf_dir):
    """SimRank, two iterations (Jeh & Widom 2002: 'two objects are
    similar if they are referenced by similar objects'), C = 0.8 —
    the RECURSIVE structural similarity kg_node_sim's one-shot
    neighbor-overlap cannot express: s2 credits a pair for having
    neighbors that are THEMSELVES similar, not merely shared.
    Iterate from s0 = identity: s1(a,b) = C*cn(a,b)/(da*db), and
    s2(a,b) = C/(da*db) * [cn(a,b)*1 + sum over neighbor pairs
    i != j of s1(i,j)] — the i = j diagonal terms fold to cn exactly.
    Everything is EXACT integer picos: s1 quantizes half-up with
    pure BIGINT arithmetic ((2*C*1e12*cn + D) div (2D), no float
    anywhere), the iteration sums those integers, and s2 re-divides
    once ((8T + 5D) div (10D) = half-up 0.8*T/D) — so two chained
    rational iterations hash bit-for-bit across engines. Candidate
    set and iteration both live on the deg <= 64 capped subgraph
    (``_capped_edges``; degrees are the SUBGRAPH's own, making this
    exactly SimRank of the induced graph): per-pair neighbor
    fan-out is bounded by cap^2 = 4096, and the s1 support (wedge-
    connected pairs) is the same candidate set — which is what makes
    SimRank iterable at web scale at all. ce and cn each feed 2+
    consumers, so both are parquet-checkpointed (the two-consumer
    rule). Top-20 with deterministic (score, a, b) order."""
    from ..operators.dedup import parquet_checkpoint

    e = _undirected_edges(spark, sf_dir)
    ce = parquet_checkpoint(_capped_edges(e), "simrank_ce")
    degc = ce.groupBy("src").agg(F.count(F.lit(1)).cast("long").alias("d"))
    cn = parquet_checkpoint(
        ce.alias("e1")
        .join(
            ce.alias("e2"),
            (F.col("e1.dst") == F.col("e2.dst"))
            & (F.col("e1.src") < F.col("e2.src")),
        )
        .groupBy(
            F.col("e1.src").alias("a"), F.col("e2.src").alias("b")
        )
        .agg(F.count(F.lit(1)).cast("long").alias("cn")),
        "simrank_cn",
    )
    s1 = (
        cn.join(degc.select(F.col("src").alias("a"), F.col("d").alias("da")), "a")
        .join(degc.select(F.col("src").alias("b"), F.col("d").alias("db")), "b")
        .select(
            "a",
            "b",
            F.expr(
                "(2 * 800000000000 * cn + da * db) div (2 * da * db)"
            ).alias("s_ps"),
        )
    )
    p2 = (
        cn.select("a", "b")
        .join(ce.select(F.col("src").alias("a"), F.col("dst").alias("i")), "a")
        .join(ce.select(F.col("src").alias("b"), F.col("dst").alias("j")), "b")
    )
    contrib = p2.join(
        s1.select(
            F.col("a").alias("sa"), F.col("b").alias("sb"), "s_ps"
        ),
        (F.col("i") != F.col("j"))
        & (F.col("sa") == F.least("i", "j"))
        & (F.col("sb") == F.greatest("i", "j")),
        "left",
    ).select(
        "a",
        "b",
        F.when(F.col("i") == F.col("j"), F.lit(1000000000000))
        .otherwise(F.coalesce(F.col("s_ps"), F.lit(0)))
        .alias("t_ps"),
    )
    tot = contrib.groupBy("a", "b").agg(
        F.sum("t_ps").cast("long").alias("total_ps")
    )
    s2 = (
        tot.join(degc.select(F.col("src").alias("a"), F.col("d").alias("da")), "a")
        .join(degc.select(F.col("src").alias("b"), F.col("d").alias("db")), "b")
        .select(
            "a",
            "b",
            F.expr(
                "(8 * total_ps + 5 * da * db) div (10 * da * db)"
            ).alias("s2_ps"),
        )
    )
    return (
        s2.orderBy(F.desc("s2_ps"), "a", "b")
        .limit(20)
        .select(
            F.col("a").alias("uri_a"),
            F.col("b").alias("uri_b"),
            F.col("s2_ps").cast("long").alias("s2_ps"),
            (
                F.round(F.col("s2_ps") / F.lit(1000000000000.0), 6)
                + F.lit(0.0)
            ).alias("simrank2"),
        )
    )


# ---------------------------------------------------------------------------
# wave 160: global transitivity on the degree-capped co-occurrence graph
# ---------------------------------------------------------------------------
@q(
    "kg_transitivity",
    f"""
    WITH {_GRAMS_SQL},
    {_DOCENT_SQL},
    {_PAIRS_SQL},
    {_UEDGES_SQL},
    {_CEDGES_SQL},
    deg AS (SELECT src, CAST(COUNT(*) AS BIGINT) AS d
            FROM ce GROUP BY src),
    wdg AS (SELECT CAST(COALESCE(SUM(d * (d - 1) / 2), 0) AS BIGINT)
              AS n_wedges FROM deg),
    cp AS (SELECT src AS uri_a, dst AS uri_b FROM ce
           WHERE src < dst),
    tri AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_triangles
      FROM cp e1
      JOIN cp e2 ON e2.uri_a = e1.uri_b
      JOIN cp e3 ON e3.uri_a = e1.uri_a AND e3.uri_b = e2.uri_b)
    SELECT w.n_wedges, t.n_triangles,
           CASE WHEN w.n_wedges = 0 THEN NULL
                ELSE round(3.0 * t.n_triangles / w.n_wedges, 6) + 0
           END AS transitivity
    FROM wdg w, tri t
    """,
)
def kg_transitivity(spark, sf_dir):
    """GLOBAL transitivity of the co-occurrence graph — 3*triangles
    / wedges, the one-number clustering summary (kg_clustering's
    per-node coefficients average the RATIO; transitivity ratios
    the SUMS, so hubs weigh in by their wedge count — the two
    diverge exactly when degree is skewed, which is why both are
    reported in any serious graph profile). Computed on the
    deg <= 64 induced subgraph (_capped_edges — the shared wedge
    cap, mirrored in the twin): the wedge count is the CLOSED FORM
    sum d(d-1)/2 over the capped degree relation (no wedge
    materialization at all), and the triangle count reuses
    kg_triangles' oriented a<b<c three-way self-join on the capped
    orientation. Both numbers are exact BIGINTs; transitivity is
    one guarded division, and 3T <= W is a structural invariant
    pinned in the replay test. The edge relation is built once and
    checkpointed for its two consumers (degree fold + triangle
    join — the checkpoint-consumers rule)."""
    from ..operators.dedup import parquet_checkpoint

    e = _undirected_edges(spark, sf_dir)
    ce = parquet_checkpoint(_capped_edges(e), "transitivity_ce")
    deg = ce.groupBy("src").agg(
        F.count(F.lit(1)).cast("long").alias("d")
    )
    wdg = deg.agg(
        F.coalesce(
            F.sum(F.col("d") * (F.col("d") - 1) / 2), F.lit(0)
        )
        .cast("long")
        .alias("n_wedges")
    )
    cp = ce.filter(F.col("src") < F.col("dst")).select(
        F.col("src").alias("uri_a"), F.col("dst").alias("uri_b")
    )
    e1 = cp.alias("e1")
    e2 = cp.alias("e2")
    e3 = cp.alias("e3")
    tri = (
        e1.join(e2, F.col("e2.uri_a") == F.col("e1.uri_b"))
        .join(
            e3,
            (F.col("e3.uri_a") == F.col("e1.uri_a"))
            & (F.col("e3.uri_b") == F.col("e2.uri_b")),
        )
        .agg(F.count(F.lit(1)).cast("long").alias("n_triangles"))
    )
    j = wdg.crossJoin(tri)
    return j.select(
        "n_wedges",
        "n_triangles",
        F.when(F.col("n_wedges") == 0, F.lit(None).cast("double"))
        .otherwise(
            F.round(
                F.lit(3.0) * F.col("n_triangles") / F.col("n_wedges"),
                6,
            )
            + F.lit(0.0)
        )
        .alias("transitivity"),
    )


# ---------------------------------------------------------------------------
# wave 164: confidence-threshold survival sweep (the reference's knob)
# ---------------------------------------------------------------------------
@q(
    "kg_confidence_sweep",
    f"""
    WITH {_GRAMS_SQL},
    cand AS (
      SELECT g.doc_id, g.pos, g.sf AS surface_form, d.uri, d.w
      FROM grams g JOIN {_DICT_SQL} ON g.sf = d.sf),
    best AS (
      SELECT doc_id, pos, surface_form, uri,
             round(CAST(w AS DOUBLE) / SUM(w) OVER (
               PARTITION BY doc_id, pos, surface_form), 6) AS conf,
             row_number() OVER (PARTITION BY doc_id, pos, surface_form
                                ORDER BY w DESC, uri) AS rn
      FROM cand),
    men AS (SELECT uri, conf FROM best WHERE rn = 1),
    tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_total FROM men),
    sweep AS (
      SELECT CAST(th AS BIGINT) AS thr_pct, m.uri, m.conf
      FROM men m CROSS JOIN
           (SELECT UNNEST([0, 10, 20, 30, 40, 50, 60, 70, 80, 90])
              AS th) ts
      WHERE m.conf >= th / 100.0)
    SELECT s.thr_pct,
           CAST(COUNT(*) AS BIGINT) AS n_kept,
           CAST(COUNT(DISTINCT s.uri) AS BIGINT) AS n_uris,
           round(CAST(COUNT(*) AS DOUBLE) / MAX(t.n_total), 6) + 0
             AS keep_rate
    FROM sweep s CROSS JOIN tot t
    GROUP BY s.thr_pct ORDER BY s.thr_pct
    """,
)
def kg_confidence_sweep(spark, sf_dir):
    """Confidence-threshold SURVIVAL SWEEP — the operating curve
    behind the reference service's `confidence` request parameter
    (SURVEY §3.1: the one knob every caller tunes): for each
    threshold 0.0 .. 0.9, how many argmax annotations survive
    conf >= tau and how many distinct entities remain, where conf
    is the winner's normalized prior mass P(e|s) (kg_candidates'
    p_e_given_s at rank 1 — ROUNDED to 6 before the compare, so
    threshold membership can never straddle an engine ulp). This
    is ml_pr_curve's sweep discipline applied to the annotation
    pipeline itself: one pass builds the mention relation, a x10
    literal threshold fan-out (map-side, the events_rolling_dau
    trick) buckets it, and the keep-rate divides by the unfiltered
    total attached as a 1-row aggregate. Monotonicity (n_kept
    non-increasing in tau, n_uris <= n_kept) is pinned in the
    replay test. Scale shape: mentions relation once, fan-out x10,
    one group-by over 10 cells."""
    grams = _grams_spark(spark, sf_dir)
    cand = grams.join(
        F.broadcast(_dict_df(spark)), "sf"
    ).withColumnRenamed("sf", "surface_form")
    key = ["doc_id", "pos", "surface_form"]
    wname = Window.partitionBy(*key).orderBy(F.desc("w"), F.asc("uri"))
    men = (
        cand.withColumn(
            "conf",
            F.round(
                F.col("w").cast("double")
                / F.sum("w").over(Window.partitionBy(*key)),
                6,
            ),
        )
        .withColumn("rn", F.row_number().over(wname))
        .filter(F.col("rn") == 1)
        .select("uri", "conf")
    )
    from ..operators.dedup import parquet_checkpoint

    men = parquet_checkpoint(men, "confsweep_men")
    tot = men.agg(F.count(F.lit(1)).cast("long").alias("n_total"))
    ths = spark.range(0, 100, 10).select(
        F.col("id").cast("long").alias("thr_pct")
    )
    sweep = men.crossJoin(F.broadcast(ths)).filter(
        F.col("conf") >= F.col("thr_pct") / F.lit(100.0)
    )
    return (
        sweep.groupBy("thr_pct")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_kept"),
            F.countDistinct("uri").cast("long").alias("n_uris"),
        )
        .crossJoin(tot)
        .select(
            "thr_pct",
            "n_kept",
            "n_uris",
            (
                F.round(
                    F.col("n_kept").cast("double")
                    / F.col("n_total"),
                    6,
                )
                + F.lit(0.0)
            ).alias("keep_rate"),
        )
        .orderBy("thr_pct")
    )


# ---------------------------------------------------------------------------
# wave 164: dictionary coverage of the corpus token stream
# ---------------------------------------------------------------------------
@q(
    "kg_dict_coverage",
    f"""
    WITH tok AS (
      SELECT lang, unnest(string_split(text, ' ')) AS tk
      FROM documents),
    nt AS (
      SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_tokens
      FROM tok WHERE tk <> '' GROUP BY lang),
    hit AS (
      SELECT t.lang, CAST(COUNT(*) AS BIGINT) AS n_hits
      FROM tok t JOIN (SELECT DISTINCT sf FROM {_DICT_SQL}) d
        ON t.tk = d.sf
      GROUP BY t.lang)
    SELECT nt.lang, nt.n_tokens,
           CAST(COALESCE(h.n_hits, 0) AS BIGINT) AS n_hits,
           round(CAST(COALESCE(h.n_hits, 0) AS DOUBLE)
                 / nt.n_tokens, 6) + 0 AS coverage
    FROM nt LEFT JOIN hit h ON h.lang = nt.lang
    ORDER BY nt.lang
    """,
)
def kg_dict_coverage(spark, sf_dir):
    """CORPUS-side dictionary coverage per language — what fraction
    of the token stream is a spotting-dictionary surface form
    (spot_mentions counts hits per SF; this face asks the inverse
    question a model-builder asks before shipping a dictionary to
    a new language shard: how much of THIS corpus can the spotter
    even see). Unigram tokens joined to the distinct-SF relation
    (broadcast — the dictionary is model-sized by construction),
    per-lang totals as a separate aggregate LEFT-joined so a lang
    with zero hits still reports coverage 0.000000 rather than
    vanishing (the absent-cell lesson). Exact integer counts, one
    rounded division. Honesty note (measured): the SYNTHETIC lang
    shards share one vocabulary, so en does NOT dominate here —
    on real multilingual crawl data this face is exactly the
    report that would catch an English-only dictionary shipped to
    a zh shard; on this fixture it truthfully reports near-uniform
    coverage (the text_langid_confusion disqualification shape).
    One scan, map-side explode, two vocabulary-bounded
    aggregates."""
    tok = (
        t(spark, sf_dir, "documents")
        .select("lang", F.explode(F.split("text", " ")).alias("tk"))
        .filter(F.col("tk") != "")
    )
    from ..operators.dedup import parquet_checkpoint

    tok = parquet_checkpoint(tok, "dictcov_tok")
    nt = tok.groupBy("lang").agg(
        F.count(F.lit(1)).cast("long").alias("n_tokens")
    )
    d = F.broadcast(_dict_df(spark).select("sf").distinct())
    hit = (
        tok.join(d, tok["tk"] == d["sf"])
        .groupBy("lang")
        .agg(F.count(F.lit(1)).cast("long").alias("n_hits"))
    )
    return (
        nt.join(hit, "lang", "left")
        .select(
            "lang",
            "n_tokens",
            F.coalesce(F.col("n_hits"), F.lit(0))
            .cast("long")
            .alias("n_hits"),
            (
                F.round(
                    F.coalesce(F.col("n_hits"), F.lit(0)).cast(
                        "double"
                    )
                    / F.col("n_tokens"),
                    6,
                )
                + F.lit(0.0)
            ).alias("coverage"),
        )
        .orderBy("lang")
    )


# ---------------------------------------------------------------------------
# wave 180: centrality agreement — Spearman of degree vs PageRank
# ---------------------------------------------------------------------------
@q(
    "kg_centrality_corr",
    f"""
    WITH {_GRAMS_SQL},
    {_DOCENT_SQL},
    p AS (
      SELECT a.uri AS uri_a, b.uri AS uri_b
      FROM de a JOIN de b ON a.doc_id = b.doc_id AND a.uri < b.uri
      GROUP BY a.uri, b.uri),
    e AS (SELECT uri_a AS src, uri_b AS dst FROM p
          UNION ALL SELECT uri_b, uri_a FROM p),
    v AS (SELECT DISTINCT src AS uri FROM e),
    nv AS (SELECT COUNT(*) AS n_v FROM v),
    deg AS (SELECT src, COUNT(*) AS outdeg FROM e GROUP BY src),
    r0 AS (SELECT v.uri, CAST(1.0 AS DOUBLE) / nv.n_v AS rank
           FROM v CROSS JOIN nv),
    {_pagerank_iter_sql("r0", "r1")},
    {_pagerank_iter_sql("r1", "r2")},
    {_pagerank_iter_sql("r2", "r3")},
    cent AS (
      SELECT d.src AS uri, CAST(d.outdeg AS BIGINT) AS degree,
             round(r.rank, 6) AS pr
      FROM deg d JOIN r3 r ON r.uri = d.src),
    rk AS (
      SELECT CAST(2 * RANK() OVER (ORDER BY degree)
                  + COUNT(*) OVER (PARTITION BY degree) - 1
                  AS BIGINT) AS dx,
             CAST(2 * RANK() OVER (ORDER BY pr)
                  + COUNT(*) OVER (PARTITION BY pr) - 1
                  AS BIGINT) AS dy
      FROM cent),
    m AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(COALESCE(SUM(dx), 0) AS BIGINT) AS sx,
             CAST(COALESCE(SUM(dy), 0) AS BIGINT) AS sy,
             CAST(COALESCE(SUM(dx * dy), 0) AS BIGINT) AS sxy,
             CAST(COALESCE(SUM(dx * dx), 0) AS BIGINT) AS sxx,
             CAST(COALESCE(SUM(dy * dy), 0) AS BIGINT) AS syy
      FROM rk)
    SELECT n AS n_entities,
           CASE WHEN n < 3
                     OR n * sxx - sx * sx <= 0
                     OR n * syy - sy * sy <= 0 THEN NULL
                ELSE round(CAST(n * sxy - sx * sy AS DOUBLE)
                           / sqrt(CAST(n * sxx - sx * sx
                                       AS DOUBLE))
                           / sqrt(CAST(n * syy - sy * sy
                                       AS DOUBLE)), 6) + 0
           END AS spearman_deg_pr
    FROM m
    """,
)
def kg_centrality_corr(spark, sf_dir):
    """Centrality AGREEMENT — Spearman rank correlation between
    degree and 3-round PageRank over the co-occurrence entities:
    the graph-sanity number that says whether the expensive
    centrality adds information beyond the cheap one (rho -> 1
    means degree is a sufficient salience proxy and the PageRank
    job can be skipped at serving time; a low rho localizes WHERE
    the random walk disagrees with raw popularity — hub-adjacency
    effects). Ranks are doubled midranks on BOTH axes (exact
    BIGINTs; PageRank is float, so it is ROUNDED to 6 — the
    operator's own published precision — BEFORE ranking, making
    tie groups engine-identical), and rho is the Pearson of the
    doubled ranks via cross-multiplied integer moments (doubling
    cancels in the ratio). The entity relation is model-sized, so
    every window is bounded. The replay test brute-forces
    Spearman in Python and pins rho strongly positive; on the
    small hub-free fixture the two rankings COINCIDE (rho rounds
    to exactly 1 — measured), which is itself the result: skip
    the PageRank job until the graph grows hubs."""
    from ..operators.closure import pagerank

    de = _doc_entities(spark, sf_dir)
    pairs = (
        de.alias("a")
        .join(de.alias("b"), "doc_id")
        .filter(F.col("a.uri") < F.col("b.uri"))
        .select(
            F.col("a.uri").alias("uri_a"),
            F.col("b.uri").alias("uri_b"),
        )
        .distinct()
    )
    edges = pairs.select(
        F.col("uri_a").alias("src"), F.col("uri_b").alias("dst")
    ).unionByName(
        pairs.select(
            F.col("uri_b").alias("src"), F.col("uri_a").alias("dst")
        )
    )
    from ..operators.dedup import parquet_checkpoint

    edges = parquet_checkpoint(edges, "centcorr_edges")
    deg = edges.groupBy("src").agg(
        F.count(F.lit(1)).cast("long").alias("degree")
    )
    pr = pagerank(edges, iterations=3, damping=0.85).select(
        "uri", F.round("rank", 6).alias("pr")
    )
    cent = deg.join(pr, deg["src"] == pr["uri"]).select(
        "degree", "pr"
    )
    rk = cent.select(
        (
            2 * F.rank().over(Window.orderBy("degree"))
            + F.count(F.lit(1)).over(Window.partitionBy("degree"))
            - 1
        )
        .cast("long")
        .alias("dx"),
        (
            2 * F.rank().over(Window.orderBy("pr"))
            + F.count(F.lit(1)).over(Window.partitionBy("pr"))
            - 1
        )
        .cast("long")
        .alias("dy"),
    )
    m = rk.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.coalesce(F.sum("dx"), F.lit(0)).cast("long").alias("sx"),
        F.coalesce(F.sum("dy"), F.lit(0)).cast("long").alias("sy"),
        F.coalesce(F.sum(F.col("dx") * F.col("dy")), F.lit(0))
        .cast("long")
        .alias("sxy"),
        F.coalesce(F.sum(F.col("dx") * F.col("dx")), F.lit(0))
        .cast("long")
        .alias("sxx"),
        F.coalesce(F.sum(F.col("dy") * F.col("dy")), F.lit(0))
        .cast("long")
        .alias("syy"),
    )
    n = F.col("n")
    vx = n * F.col("sxx") - F.col("sx") * F.col("sx")
    vy = n * F.col("syy") - F.col("sy") * F.col("sy")
    cov = n * F.col("sxy") - F.col("sx") * F.col("sy")
    bad = (n < 3) | (vx <= 0) | (vy <= 0)
    return m.select(
        n.alias("n_entities"),
        F.when(bad, F.lit(None).cast("double"))
        .otherwise(
            F.round(
                cov.cast("double")
                / F.sqrt(vx.cast("double"))
                / F.sqrt(vy.cast("double")),
                6,
            )
            + F.lit(0.0)
        )
        .alias("spearman_deg_pr"),
    )
