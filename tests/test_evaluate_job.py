"""End-to-end test for jobs/evaluate.py: known emitted/gold overlap
-> exact tp/fp/fn counts, P/R/F1 values, and the --min-f1 CI gate."""

from __future__ import annotations

import pytest


def _write(spark, path, rows):
    spark.createDataFrame(rows, ["url", "start", "end", "uri"]).write.mode(
        "overwrite"
    ).parquet(path)


@pytest.fixture()
def eval_dirs(spark, tmp_path):
    gold = [
        ("u1", 0, 5, "dbr:A"),
        ("u1", 10, 15, "dbr:B"),
        ("u2", 0, 4, "dbr:C"),
        ("u2", 8, 12, "dbr:D"),
    ]
    emitted = [
        ("u1", 0, 5, "dbr:A"),    # tp
        ("u1", 10, 15, "dbr:B"),  # tp
        ("u2", 0, 4, "dbr:X"),    # fp (wrong uri) + fn for dbr:C
        ("u3", 1, 3, "dbr:E"),    # fp (no gold url)
        ("u1", 0, 5, "dbr:A"),    # duplicate emission -> still one tp
    ]
    _write(spark, str(tmp_path / "gold"), gold)
    _write(spark, str(tmp_path / "emitted"), emitted)
    return tmp_path


def test_evaluate_job_exact_counts(spark, eval_dirs):
    from jobs.evaluate import main

    out = str(eval_dirs / "out")
    rc = main(
        [
            "--emitted", str(eval_dirs / "emitted"),
            "--gold", str(eval_dirs / "gold"),
            "--out", out,
        ]
    )
    assert rc == 0
    m = spark.read.parquet(f"{out}/metrics").first()
    assert (m.tp, m.fp, m.fn) == (2, 2, 2)
    assert m.precision == pytest.approx(0.5)
    assert m.recall == pytest.approx(0.5)
    assert m.f1 == pytest.approx(0.5)
    aligned = spark.read.parquet(f"{out}/alignment")
    statuses = {
        (r.url, r.start, r.end, r.uri): r.status for r in aligned.collect()
    }
    assert statuses[("u1", 0, 5, "dbr:A")] == "tp"
    assert statuses[("u2", 0, 4, "dbr:X")] == "fp"
    assert statuses[("u2", 0, 4, "dbr:C")] == "fn"
    # the dedup in align(): the duplicate emission produced ONE row
    assert len(statuses) == aligned.count()


def test_evaluate_job_min_f1_gate(spark, eval_dirs):
    from jobs.evaluate import main

    rc = main(
        [
            "--emitted", str(eval_dirs / "emitted"),
            "--gold", str(eval_dirs / "gold"),
            "--out", str(eval_dirs / "out_gate"),
            "--min-f1", "0.95",
        ]
    )
    assert rc == 1


def test_evaluate_job_perfect_on_goldens(spark, eval_dirs):
    """Self-eval: gold vs gold is P=R=F1=1.0 (the north_rule fixture
    identity the golden tests rely on)."""
    from jobs.evaluate import main

    out = str(eval_dirs / "out_self")
    rc = main(
        [
            "--emitted", str(eval_dirs / "gold"),
            "--gold", str(eval_dirs / "gold"),
            "--out", out,
            "--min-f1", "0.999",
        ]
    )
    assert rc == 0
    m = spark.read.parquet(f"{out}/metrics").first()
    assert (m.precision, m.recall, m.f1) == (1.0, 1.0, 1.0)
