"""Python Data Source API (Spark 4) tests: partition granularity is
one-per-file, parsing tolerates junk lines, and the custom source
agrees with the JVM-regex NT reader on the same dump.
"""

from __future__ import annotations

from dbpedia_spotlight_db_spark.sources import catalog, nt_datasource


def test_partitions_are_per_file_and_junk_is_skipped(spark, tmp_path):
    d = tmp_path / "nt"
    d.mkdir()
    (d / "a.nt").write_text(
        "<http://s/1> <http://p/x> <http://o/1> .\n"
        "not a triple line\n"
        "<http://s/2> <http://p/x> <http://o/2> .\n"
    )
    (d / "b.nt").write_text("<http://s/3> <http://p/y> <http://o/3> .\n")
    (d / "_SUCCESS").write_text("")  # marker files must be ignored
    nt_datasource.register(spark)
    df = spark.read.format("ntriples").load(str(d))
    # file-grained parallelism: 2 data files -> 2 partitions
    assert df.rdd.getNumPartitions() == 2
    rows = {(r.subj, r.pred, r.obj) for r in df.collect()}
    assert rows == {
        ("http://s/1", "http://p/x", "http://o/1"),
        ("http://s/2", "http://p/x", "http://o/2"),
        ("http://s/3", "http://p/y", "http://o/3"),
    }


def test_python_source_agrees_with_jvm_reader(spark, tmp_path):
    d = tmp_path / "nt2"
    d.mkdir()
    lines = [
        f"<http://doc/{i}> <http://dbpedia.org/ontology/mentions> "
        f"<http://dbpedia.org/resource/E{i % 3}> ."
        for i in range(20)
    ]
    (d / "part-0.txt").write_text("\n".join(lines[:12]) + "\n")
    (d / "part-1.txt").write_text("\n".join(lines[12:]) + "\n")
    nt_datasource.register(spark)
    py = {
        tuple(r)
        for r in spark.read.format("ntriples").load(str(d)).collect()
    }
    jvm = {
        tuple(r) for r in catalog.read_nt_triples(spark, str(d)).collect()
    }
    assert py == jvm and len(py) == 20
