"""Sources/sinks: catalog seam (Iceberg in prod, Parquet+manifest in
the sandbox), testdata readers, NT triple ingestion.
"""
