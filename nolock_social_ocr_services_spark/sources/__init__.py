"""Table-format sources: snapshot-isolated parquet tables (Iceberg
semantics re-implemented; the sandbox ships no Iceberg runtime jar)."""
