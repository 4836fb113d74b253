"""SparkSession factory tuned for the KG-construction workload.

Scale posture (SURVEY.md §4): AQE on (dynamic coalescing + skew-join
splitting), Arrow enabled for every Python boundary, shuffle
partitions fleet-sized by default and raised per-job for corpus-scale
shuffles (see DEFAULT_SHUFFLE_PARTITIONS; the scaling legs pin
>= 4x cores so an N -> 4N scale-up never under-partitions), and an
explicit broadcast threshold so the store tables (surface_forms /
candidate_map / entities) broadcast instead of shuffling the
10^12-row pages side.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# Default shuffle partitions = the session's core count (fleet-sized).
# Measured (interleaved A/B, sf0.1): the flagship model build is 2x
# faster at 32 than at 128 on 32 cores — AQE's cost scales with the
# INITIAL reducer count per stage (pinning
# adaptive.coalescePartitions.initialPartitionNum=128 reproduces the
# slowdown even with shuffle.partitions=32), and AQE can coalesce
# reducers down but never raise them for non-skew stages. Jobs that
# shuffle corpus-scale relations size UP per-job (the bench scaling
# legs pin max(128, 4*cores); cluster jobs set SPARK_SHUFFLE_PARTITIONS
# or the shuffle_partitions argument) — raising is the caller's call
# because only the caller knows the data size.
DEFAULT_SHUFFLE_PARTITIONS = 0  # 0 -> use core count


def get_spark(
    app_name: str = "dbpedia-spotlight-db-spark",
    cores: int | str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) the session.

    ``cores`` controls local parallelism (the sandbox proxy for
    executor count: local[8] vs local[32] evidences the N->4N scaling
    rule). On a real cluster the master is supplied by spark-submit
    and this falls through untouched.
    """
    if cores is None:
        cores = os.environ.get("SPARK_GRAFT_CPUS", "32")
    master = os.environ.get("SPARK_GRAFT_MASTER", f"local[{cores}]")
    nshuffle = shuffle_partitions or int(
        os.environ.get("SPARK_SHUFFLE_PARTITIONS", DEFAULT_SHUFFLE_PARTITIONS)
    )
    if not nshuffle:
        nshuffle = int(cores) if str(cores).isdigit() else 32
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        # --- adaptive execution: runtime re-plan, skew-join splitting ---
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # --- shuffle sizing ---
        .config("spark.sql.shuffle.partitions", str(nshuffle))
        .config("spark.sql.files.maxPartitionBytes", "134217728")
        # --- Python boundary: Arrow everywhere, batched ---
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config(
            "spark.sql.execution.arrow.maxRecordsPerBatch",
            os.environ.get("SPARK_ARROW_BATCH", "10000"),
        )
        # --- broadcast: store tables are size-known small dims ---
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # deterministic timestamps everywhere: pandas/Arrow boundaries
        # localize to the session tz, so a host-dependent tz would skew
        # stateful-streaming epochs and oracle timestamp comparisons
        .config("spark.sql.session.timeZone", "UTC")
        # quieter local runs
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "48g"))
        # shuffle/checkpoint scratch on tmpfs: local-mode disk latency is
        # not what we benchmark (a cluster has per-executor local SSDs)
        .config("spark.local.dir", os.environ.get("SPARK_LOCAL_DIRS", "/dev/shm/spark-local"))
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


def stop_spark() -> None:
    active = SparkSession.getActiveSession()
    if active is not None:
        active.stop()

