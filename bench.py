#!/usr/bin/env python3
"""Headline benchmark (driver contract).

Default mode runs the headline queries at ``$SPARK_GRAFT_SF_DIR``
(default /root/testdata/sf0.1) on ``local[$SPARK_GRAFT_CPUS]`` and
prints ONE JSON line::

    {"metric": "headline_total", "value": <sec>, "unit": "sec",
     "queries": {"kg_flagship": sec, ...}, "sf": 0.1, ...}

Extra keys: ``throughput`` (flagship docs/sec + triples/sec) and
``scaling`` (the N->4N efficiency record from the most recent
``tools/bench_scaling.py`` run, if present).

Leg mode (used by tools/bench_scaling.py for the two-cluster-size
scaling evidence; BASELINE.md "scaling efficiency" row)::

    python bench.py --leg <cores> <replicate>

builds the stores once (untimed — the fixed-size offline model build),
then times P1-P3 (extract -> tokenize -> spot -> disambiguate ->
canonicalize -> triples) over the documents table replicated
<replicate>x, on local[<cores>], and prints one JSON line with
docs/sec + triples/sec.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

REPO = Path(__file__).resolve().parent

# headline operator queries (registry keys) — the shuffle/join/UDF-heavy
# representatives of SURVEY.md §2.6 + the training-data ops
HEADLINE = [
    "kg_annotate_prior",
    "spot_mentions",
    "agg_salted",
    "agg_counts",
    "join_sortmerge",
    "win_topk",
    "dedup_minhash",
    "dedup_lsh_pairs",
    "ann_cosine_topk",
    "text_quality",
    "json_fns",
]


def _force(df) -> int:
    """Fully execute a plan without driver-side materialization cost."""
    return df.write.format("noop").mode("overwrite").save() or 0


def headline_mode() -> None:
    from dbpedia_spotlight_db_spark.entrypoint import flagship
    from dbpedia_spotlight_db_spark.queries import QUERIES
    from dbpedia_spotlight_db_spark.session import get_spark

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cores = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark("bench", cores=cores)
    # warm the JVM/codegen path AND the Python worker pool (spawning
    # `cores` workers takes seconds and is a one-off on a long-lived
    # cluster) so timings measure the queries
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    warm_df = spark.range(cores * 8).repartition(cores * 4)

    def _noop_batches(it):
        yield from it

    warm_df.mapInPandas(_noop_batches, warm_df.schema).count()
    # warm the FLAGSHIP plan shapes at the smallest fixture (sf0.001,
    # ~2-3 s of data): Catalyst/Janino compile each distinct physical
    # plan shape once per JVM, and on a long-lived cluster the engine
    # is always past that point — the timed sf0.1 run below then
    # measures the engine, not first-compilation of ~30 plan shapes
    # (the "JIT warm pass matters" lesson, BENCH.md). The warm run's
    # caches are dropped so the timed run materializes its own stores.
    warm_sf = os.path.join(os.path.dirname(sf_dir.rstrip("/")), "sf0.001")
    if not os.path.isdir(warm_sf):
        warm_sf = sf_dir  # bench input lives elsewhere: warm on itself
    flagship(spark, warm_sf).count()
    spark.catalog.clearCache()

    times: dict[str, float] = {}

    t0 = time.perf_counter()
    triples = flagship(spark, sf_dir)
    n_triples = triples.count()
    flagship_sec = time.perf_counter() - t0
    times["kg_flagship"] = round(flagship_sec, 3)
    n_docs = spark.read.parquet(f"{sf_dir}/documents.parquet").count()

    for name in HEADLINE:
        fn = QUERIES[name]
        t0 = time.perf_counter()
        _force(fn(spark, sf_dir))
        times[name] = round(time.perf_counter() - t0, 3)

    try:
        sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1])
    except ValueError:
        sf = None

    out = {
        "metric": "headline_total",
        "value": round(sum(times.values()), 3),
        "unit": "sec",
        "queries": times,
        "sf": sf,
        "cores": cores,
        "throughput": {
            "flagship_docs_per_sec": round(n_docs / flagship_sec, 2),
            "flagship_triples_per_sec": round(n_triples / flagship_sec, 2),
            "flagship_triples": n_triples,
        },
    }
    scaling_file = REPO / "BENCH_SCALING.json"
    if scaling_file.exists():
        try:
            s = json.loads(scaling_file.read_text())
            # COMPACT summary only (<=300 bytes). The driver keeps just
            # the last 2,000 chars of stdout and parses the JSON line
            # from that tail; in r3 the full embedded scaling record
            # grew the line to ~2,800 chars and pushed the headline
            # metrics out of the window (BENCH_r03.json "parsed": null).
            # Full detail stays in BENCH_SCALING.json.
            out["scaling"] = {
                "efficiency": s.get("scaling_efficiency"),
                "pass": (s.get("scaling_efficiency") or 0) >= 0.8,
                "docs_per_sec_n": s.get("local8", {}).get("docs_per_sec"),
                "docs_per_sec_4n": s.get("local32", {}).get("docs_per_sec"),
                "date": s.get("date"),
                "detail": "BENCH_SCALING.json",
            }
        except Exception:
            pass
    line = json.dumps(out)
    # hard contract: the whole line must sit inside the driver's tail
    # window with slack for wrapper noise
    assert len(line) < 1500, f"bench JSON line too long: {len(line)}"
    print(line)


class _CpuSampler:
    """Samples /proc/stat for THIS PROCESS's allowed cpu set (from
    sched_getaffinity — the taskset pin when bench_scaling drives the
    leg, every cpu when run unpinned) during the timed section.
    busy_frac answers the attribution question directly: a ~1.0 busy
    fraction at both levels means the efficiency ceiling is memory
    bandwidth (the no-Spark control's explanation), not idle workers.
    Hypervisor steal is excluded from both numerator and denominator —
    stolen cycles were never available to the job, and counting them
    as busy would bias the attribution the metric exists for."""

    def __init__(self):
        self.cpus = sorted(os.sched_getaffinity(0))
        self.samples: list[float] = []
        self._stop = False
        import threading

        self._t = threading.Thread(target=self._run, daemon=True)

    def _read(self):
        busy = idle = 0
        allowed = set(self.cpus)
        with open("/proc/stat") as f:
            for line in f:
                if line.startswith("cpu") and line[3].isdigit():
                    parts = line.split()
                    n = int(parts[0][3:])
                    if n not in allowed:
                        continue
                    vals = list(map(int, parts[1:]))
                    steal = vals[7] if len(vals) > 7 else 0
                    # guest/guest_nice (fields 9-10) are already folded
                    # into user/nice by the kernel — counting them again
                    # would double-book guest cycles as busy
                    guest = vals[8] if len(vals) > 8 else 0
                    guest_nice = vals[9] if len(vals) > 9 else 0
                    idle += vals[3] + vals[4]  # idle + iowait
                    busy += (
                        sum(vals) - vals[3] - vals[4] - steal
                        - guest - guest_nice
                    )
        return busy, idle

    def _run(self):
        import time as _t

        prev = self._read()
        while not self._stop:
            _t.sleep(0.5)
            cur = self._read()
            db, di = cur[0] - prev[0], cur[1] - prev[1]
            if db + di > 0:
                self.samples.append(db / (db + di))
            prev = cur

    def start(self):
        self._t.start()

    def stop(self) -> float:
        self._stop = True
        self._t.join(timeout=2)
        return (
            round(sum(self.samples) / len(self.samples), 3)
            if self.samples
            else -1.0
        )


def _jvm_gc_ms(spark) -> int:
    """Cumulative GC time of the DRIVER JVM only — in local mode (the
    scaling protocol) driver and executor share one JVM so this is the
    whole story; under SPARK_GRAFT_MASTER=local-cluster the separate
    executor JVMs' GC is NOT included here."""
    try:
        beans = (
            spark.sparkContext._jvm.java.lang.management.ManagementFactory
            .getGarbageCollectorMXBeans()
        )
        return sum(
            beans.get(i).getCollectionTime() for i in range(beans.size())
        )
    except Exception:
        return -1


def leg_mode(cores: int, replicate: int) -> None:
    from dbpedia_spotlight_db_spark.entrypoint import (
        annotate_to_triples,
        documents_as_pages,
        replicate_docs,
        world_stores,
    )
    from dbpedia_spotlight_db_spark.session import get_spark

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    # Driver-sanctioned N -> 4N proxy: local[8] vs local[32], each leg
    # pinned by tools/bench_scaling.py to exactly `cores` CPUs (the
    # container cpu-limit a cluster scheduler imposes). Set
    # SPARK_GRAFT_MASTER=local-cluster[n,4,6144] to run real separate
    # executor JVMs instead (measured slower at 4N here: per-executor
    # JIT + RPC shuffle dominate at this input size).
    spark = get_spark(
        f"bench-leg-{cores}",
        cores=cores,
        # partitions >= 4x cores at BOTH levels so the 4N run is never
        # under-partitioned (SURVEY.md §4.3)
        shuffle_partitions=max(128, cores * 4),
        extra_conf={
            "spark.executor.memory": "5g",
            # executors are separate JVMs: ship the package to their
            # Python workers (the spark-submit --py-files analogue)
            "spark.executorEnv.PYTHONPATH": str(REPO),
            # the replicated bench input is ~1.7GB at replicate=480;
            # default 128MB splits would leave the map stage only ~1
            # task per core (no pipelining slack, stragglers
            # dominate). 16MB keeps splits >= 4x cores. Identical at
            # both levels (same job, same input). Measured A/B
            # (BENCH.md): shrinking to 6MB raises the 32-core busy
            # fraction 0.83 -> 0.88 but per-task overhead eats the
            # gain (T32 unchanged, T8 slower) — the residual idle is
            # wave-tail quantization, a small-input artifact that the
            # 4x-input leg shows vanishing with scale.
            "spark.sql.files.maxPartitionBytes": str(16 * 1024 * 1024),
        },
    )
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")

    # fixed-size offline model build (the reference's one-off
    # SpotlightModel load) — materialized + broadcast, untimed
    from dbpedia_spotlight_db_spark.entrypoint import world_model_bc

    stores = world_stores(spark, docs)
    for v in stores.values():
        if hasattr(v, "count"):
            v.count()
    model_bc = world_model_bc(spark, stores)

    npart = max(128, cores * 4)
    # INPUT PREP (untimed): materialize the replicated pages TABLE to
    # columnar storage once — the pipeline under test reads the pages
    # table from the warehouse, it does not synthesize its input.
    # Round-robin repartition of the narrow doc rows BEFORE the r-fold
    # explode (single-file source would explode serially; hash(doc_id)
    # over few keys leaves 2.6x skew).
    import shutil
    import tempfile

    scratch = tempfile.mkdtemp(prefix="bench_leg_", dir="/dev/shm")
    pages_path = os.path.join(scratch, "pages")
    documents_as_pages(
        replicate_docs(docs.repartition(npart), replicate)
    ).write.mode("overwrite").parquet(pages_path)
    pages = spark.read.parquet(pages_path)
    n_docs = pages.count()

    # warm the executor pool: spawn all Python workers, deliver the
    # broadcast model to each, and JIT-compile the full pipeline with
    # a smaller pass — on a long-lived cluster these are one-off
    # costs, not throughput (cold-vs-warm measured 1.7x on job one)
    warm = documents_as_pages(
        replicate_docs(docs.repartition(npart), max(1, replicate // 24))
    )
    annotate_to_triples(spark, warm, stores, model_bc=model_bc).count()

    sampler = _CpuSampler()
    gc0 = _jvm_gc_ms(spark)
    sampler.start()
    t0 = time.perf_counter()
    triples = annotate_to_triples(
        spark, pages, stores, model_bc=model_bc,
        checkpoint_path=os.path.join(scratch, "mentions"),
    )
    n_triples = triples.count()
    sec = time.perf_counter() - t0
    busy = sampler.stop()
    gc_ms = _jvm_gc_ms(spark) - gc0 if gc0 >= 0 else -1
    shutil.rmtree(scratch, ignore_errors=True)

    print(
        json.dumps(
            {
                "cores": cores,
                "replicate": replicate,
                "docs": n_docs,
                "triples": n_triples,
                "sec": round(sec, 3),
                "docs_per_sec": round(n_docs / sec, 2),
                "triples_per_sec": round(n_triples / sec, 2),
                # attribution: busy fraction of this process's allowed
                # cpu set during the timed window (steal excluded) +
                # driver-JVM GC delta (= the whole JVM in local mode;
                # excludes executor JVMs under local-cluster)
                "cpu_busy_frac": busy,
                "jvm_gc_ms": gc_ms,
            }
        )
    )


def leg_stores_mode(cores: int, replicate: int) -> None:
    """Shuffle-path scaling leg: P0 store build (A1-A6 salted
    aggregations + dense-id windows + vector assembly) over a
    replicated annotated corpus — the exchange-heavy complement of
    leg_mode's map-only annotate pass, so the N->4N evidence covers
    BOTH plan families the north rule cares about. Same protocol:
    input prep, corpus derivation, and JIT warm-up untimed; the timed
    section is build_stores + forcing all seven store tables."""
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    from dbpedia_spotlight_db_spark.entrypoint import (
        derive_corpus,
        replicate_docs,
    )
    from dbpedia_spotlight_db_spark.plans.build_stores import build_stores
    from dbpedia_spotlight_db_spark.session import get_spark

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(
        f"bench-stores-{cores}",
        cores=cores,
        shuffle_partitions=max(128, cores * 4),
        extra_conf={
            "spark.executor.memory": "5g",
            "spark.executorEnv.PYTHONPATH": str(REPO),
            "spark.sql.files.maxPartitionBytes": str(16 * 1024 * 1024),
            # a broadcast's CHILD is the corpus-scale salted agg here:
            # on the N-core leg at large replicates it legitimately
            # exceeds the 300 s default build timeout (the relation
            # itself stays vocab-sized — it's the upstream that is slow)
            "spark.sql.broadcastTimeout": "3600",
        },
    )
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")

    # INPUT PREP (untimed): derive the annotated corpus ONCE at base
    # scale (spotting/candidate assignment is leg_mode's pipeline —
    # already measured), replicate it with unique doc_ids (the count
    # distributions replicate exactly, preserving the Zipf skew the
    # salted aggs exist for), and land it in columnar storage — the
    # store-build job reads a corpus table, it does not synthesize it.
    scratch = tempfile.mkdtemp(prefix="bench_stores_", dir="/dev/shm")
    corpus_path = os.path.join(scratch, "corpus")
    corpus0 = derive_corpus(spark, docs)  # persisted inside
    replicate_docs(corpus0, replicate).write.mode("overwrite").parquet(
        corpus_path
    )
    spark.catalog.clearCache()
    corpus = spark.read.parquet(corpus_path)
    n_docs = corpus.count()

    def _force_stores(c) -> int:
        # force the store tables in DEPENDENCY WAVES, concurrent within
        # a wave: stores in the same wave share only eagerly
        # checkpointed FILES (occ / tokenized), so concurrent actions
        # read, never recompute; a later wave's stores join the
        # previous wave's now-cached tables. Forcing all seven at once
        # instead races Spark's persist machinery — a not-yet-cached
        # shared subtree gets recomputed by every concurrent job that
        # needs it, and the duplication grows with the slot count
        # (measured: the 32-core leg burned ~5x the 8-core leg's
        # core-seconds, inverting the scaling curve).
        stores = build_stores(spark, c, checkpoint=True)
        from concurrent.futures import ThreadPoolExecutor

        waves = [
            ["entities", "surface_forms", "tokens"],
            ["candidate_map", "context_counts"],
            ["icf", "entity_vectors"],
        ]
        total = 0
        for wave in waves:
            dfs = [stores[k] for k in wave]
            with ThreadPoolExecutor(max_workers=len(dfs)) as ex:
                total += sum(ex.map(lambda d: d.count(), dfs))
        return total

    # WARM (untimed): spawn workers + JIT the full store-build plan on
    # a 1/16 hash slice, then drop its caches
    _force_stores(corpus.filter(F.col("doc_id") % 16 == 0))
    spark.catalog.clearCache()

    sampler = _CpuSampler()
    gc0 = _jvm_gc_ms(spark)
    sampler.start()
    t0 = time.perf_counter()
    n_rows = _force_stores(corpus)
    sec = time.perf_counter() - t0
    busy = sampler.stop()
    gc_ms = _jvm_gc_ms(spark) - gc0 if gc0 >= 0 else -1
    shutil.rmtree(scratch, ignore_errors=True)

    print(
        json.dumps(
            {
                "job": "build_stores",
                "cores": cores,
                "replicate": replicate,
                "docs": n_docs,
                "triples": n_rows,  # total store rows (schema-shared key)
                "sec": round(sec, 3),
                "docs_per_sec": round(n_docs / sec, 2),
                "triples_per_sec": round(n_rows / sec, 2),
                "cpu_busy_frac": busy,
                "jvm_gc_ms": gc_ms,
            }
        )
    )


if __name__ == "__main__":
    if len(sys.argv) >= 2 and sys.argv[1] == "--leg":
        leg_mode(int(sys.argv[2]), int(sys.argv[3]))
    elif len(sys.argv) >= 2 and sys.argv[1] == "--leg-stores":
        leg_stores_mode(int(sys.argv[2]), int(sys.argv[3]))
    else:
        headline_mode()
