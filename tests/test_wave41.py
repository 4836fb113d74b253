"""Wave-41 invariants: the SQL-surface faces answer identically to
direct recounts (pipe syntax and SQL UDFs are pure syntax over the
same engine), parameter binding is idempotent across invocations,
and the collation face matches a hashlib replay of the md5-coin
case derivation."""

from __future__ import annotations

import hashlib
import math

from dbpedia_spotlight_db_spark.queries import qsql
from dbpedia_spotlight_db_spark.queries.common import t

SF = "/root/testdata/sf0.001"


def _rnd_away(x: float) -> int:
    return math.floor(x + 0.5) if x >= 0 else math.ceil(x - 0.5)


def test_sql_pipe_matches_dataframe_recount(spark):
    rows = (
        t(spark, SF, "orders")
        .filter("o_orderstatus = 'F'")
        .select("o_orderpriority", "o_totalprice")
        .collect()
    )
    want: dict[str, list[int]] = {}
    for r in rows:
        n_t = want.setdefault(r["o_orderpriority"], [0, 0])
        n_t[0] += 1
        n_t[1] += _rnd_away(r["o_totalprice"] * 100)
    got = {
        r["o_orderpriority"]: (r["n"], r["total_cents"])
        for r in qsql.Q["sql_pipe"](spark, SF).collect()
    }
    assert got == {k: tuple(v) for k, v in want.items()}


def test_sql_udf_inlines_no_python(spark):
    df = qsql.Q["sql_udf"](spark, SF)
    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    plan = buf.getvalue()
    assert "EvalPython" not in plan  # Catalyst inlined the SQL UDF
    rows = (
        t(spark, SF, "lineitem")
        .select("l_returnflag", "l_extendedprice", "l_discount", "l_tax")
        .collect()
    )
    want: dict[str, list[int]] = {}
    for r in rows:
        n_t = want.setdefault(r["l_returnflag"], [0, 0])
        n_t[0] += 1
        n_t[1] += _rnd_away(
            r["l_extendedprice"]
            * (1.0 - r["l_discount"])
            * (1.0 + r["l_tax"])
            * 100
        )
    got = {
        r["l_returnflag"]: (r["n"], r["net_cents"])
        for r in df.collect()
    }
    assert got == {k: tuple(v) for k, v in want.items()}


def test_sql_params_idempotent_and_correct(spark):
    a = sorted(map(tuple, qsql.Q["sql_params"](spark, SF).collect()))
    b = sorted(map(tuple, qsql.Q["sql_params"](spark, SF).collect()))
    assert a == b and len(a) > 0
    rows = (
        t(spark, SF, "events")
        .filter("value IS NOT NULL AND value >= 50.0")
        .select("event_type", "value")
        .collect()
    )
    want: dict[str, list[int]] = {}
    for r in rows:
        n_t = want.setdefault(r["event_type"], [0, 0])
        n_t[0] += 1
        n_t[1] += _rnd_away(r["value"] * 100)
    assert {r[0]: (r[1], r[2]) for r in a} == {
        k: tuple(v) for k, v in want.items()
    }


def test_collation_matches_hashlib_replay(spark):
    docs = t(spark, SF, "documents").select("lang", "doc_id", "text").collect()
    cs: dict[str, set] = {}
    ci: dict[str, set] = {}
    for r in docs:
        for tk in (r["text"] or "").split(" "):
            if not tk:
                continue
            coin = hashlib.md5(
                f"{tk}|{r['doc_id']}".encode()
            ).hexdigest()[0]
            v = tk.upper() if coin < "8" else tk
            cs.setdefault(r["lang"], set()).add(v)
            ci.setdefault(r["lang"], set()).add(v.lower())
    got = {r["lang"]: r for r in qsql.Q["text_collation"](spark, SF).collect()}
    assert set(got) == set(cs)
    for lang in cs:
        g = got[lang]
        assert g["vocab_cs"] == len(cs[lang])
        assert g["vocab_ci"] == len(ci[lang])
        # the derived case variants must actually exercise the collation
        assert g["vocab_cs"] > g["vocab_ci"]
        assert abs(
            g["case_blowup"] - len(cs[lang]) / len(ci[lang])
        ) < 1e-6
