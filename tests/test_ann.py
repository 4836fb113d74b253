"""ANN recall ordering: exact >= multi-probe >= single-probe — the
bucketed approximations only ever MISS neighbors, never invent them,
and one-bit multi-probe recovers a superset of single-probe."""

from __future__ import annotations

from pyspark.sql import functions as F

from dbpedia_spotlight_db_spark.operators import ann

SF_DIR = "/root/testdata/sf0.01"
DIM = 64


def _pairs(df):
    return {(r.qid, r.nid) for r in df.collect()}


def test_multiprobe_superset_and_exact_ceiling(spark):
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    qs = emb.filter(F.col("vec_id") < 10)

    single = ann.lsh_bucketed_topk(qs, emb, dim=DIM, k=3, n_planes=6)
    multi = ann.lsh_bucketed_topk(
        qs, emb, dim=DIM, k=3, n_planes=6, multiprobe=True
    )
    exact = ann.cosine_topk(qs, emb, k=3)

    # every query answered by single-probe is answered by multi-probe
    # (a flipped probe only ADDS candidate buckets)
    qs_single = {q for q, _ in _pairs(single)}
    qs_multi = {q for q, _ in _pairs(multi)}
    assert qs_single <= qs_multi
    # more candidates can only improve agreement with the exact top-k
    ex = _pairs(exact)
    assert len(_pairs(multi) & ex) >= len(_pairs(single) & ex)
    # the exact path answers every query fully
    assert len(ex) == 10 * 3


def test_quantization_error_bounded(spark):
    """int8 symmetric quantization invariant: |x - qval*scale| <=
    scale/2 (+ float tolerance) for every dimension of every vector,
    and qval stays in [-127, 127]."""
    from dbpedia_spotlight_db_spark.queries.qdata import embed_quantize

    rows = embed_quantize(spark, SF_DIR).collect()
    emb = {
        r.vec_id: list(r.embedding)
        for r in spark.read.parquet(f"{SF_DIR}/embeddings.parquet").collect()
    }
    assert rows
    for r in rows:
        assert -127 <= r.qval <= 127
        x = emb[r.vec_id][r.dim_idx]
        # scale is rounded to 9dp in the output; allow that rounding
        assert abs(x - r.qval * r.scale) <= r.scale / 2 + 1e-6
