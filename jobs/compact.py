"""Small-file compaction (OPTIMIZE / rewriteDataFiles) as a
spark-submit job: bin-pack a fragmented parquet table's files into
~target-sized output files, one distributed pass, row-count verified.

    spark-submit --py-files dist/engine.zip jobs/compact.py \
        --table <parquet dir> --out <dir> [--target-bytes 134217728]

Plan shape (the 100TB story): the FILE manifest (path, bytes) is the
only driver-side relation — metadata-scale, exactly what Iceberg's
rewriteDataFiles reads; the plan (file -> output bin by exclusive
prefix sum DIV target, the same arithmetic as the `compact_plan`
query face) broadcasts to a one-pass rewrite: every row tags itself
with its file's bin via input_file_name(), repartitions BY BIN (each
bin's rows hash to exactly one task -> exactly one output file per
bin), and writes partitionBy(bin). No per-bin driver loop issuing N
jobs, no global sort; row-count conservation is checked from the
write manifest, not a re-scan.
"""

from __future__ import annotations

import argparse
import glob
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def plan_bins(files: list[tuple[str, int]], target: int) -> dict[str, int]:
    """file path -> output bin, by running-offset division (files in
    deterministic path order; a file STARTING in bin k joins bin k)."""
    out = {}
    off = 0
    for path, size in sorted(files):
        out[path] = off // target
        off += size
    return out


def main(argv: list[str] | None = None) -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--table", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--target-bytes", type=int, default=128 * 1024 * 1024)
    args = ap.parse_args(argv)

    from pyspark.sql import functions as F

    from dbpedia_spotlight_db_spark.session import get_spark
    from dbpedia_spotlight_db_spark.sources import catalog

    spark = get_spark("kg-compact")

    files = [
        (os.path.abspath(p), os.path.getsize(p))
        for p in glob.glob(os.path.join(args.table, "*.parquet"))
        if os.path.isfile(p)
    ]
    if not files:
        raise SystemExit(f"no parquet files under {args.table}")
    bins = plan_bins(files, args.target_bytes)
    n_bins = max(bins.values()) + 1

    plan = spark.createDataFrame(
        [(f"file://{p}", b) for p, b in bins.items()], "__file string, bin int"
    )
    df = spark.read.parquet(args.table).withColumn(
        "__file", F.input_file_name()
    )
    tagged = df.join(F.broadcast(plan), "__file").drop("__file")
    (
        tagged.repartition(n_bins, "bin")
        .write.mode("overwrite")
        .partitionBy("bin")
        .parquet(os.path.join(args.out, "data"))
    )

    # conservation check: count() over parquet is metadata-cheap
    # (column-less scan, row counts from the footers)
    n_in = spark.read.parquet(args.table).count()
    out_files = glob.glob(os.path.join(args.out, "data", "bin=*", "*.parquet"))
    n_out = spark.read.parquet(os.path.join(args.out, "data")).count()
    # gate BEFORE the manifest: downstream readers trust manifests
    # instead of re-counting (catalog.manifest contract), so a
    # row-losing run must never leave a valid-looking manifest
    # beside its corrupted output
    if n_in != n_out:
        raise SystemExit(
            f"row count changed: {n_in} in vs {n_out} out — aborting"
        )
    catalog._write_manifest(
        args.out,
        "compact",
        rows=n_out,
        files_in=len(files),
        files_out=len(out_files),
        bins=n_bins,
        target_bytes=args.target_bytes,
    )
    print(
        f"compact: {len(files)} files -> {len(out_files)} files "
        f"({n_bins} bins, {n_out} rows conserved) -> {args.out}"
    )


if __name__ == "__main__":
    main()
