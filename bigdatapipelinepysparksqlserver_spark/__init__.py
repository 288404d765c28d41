"""PySpark-native analytics engine with the query and data-processing
capabilities of the reference ELT pipeline
(`tmpfsoares/BigDataPipelinePysparkSQLServer`), re-expressed Spark-first.

Layout
------
- ``session``    — SparkSession factory (AQE, Arrow, dynamic partition overwrite)
- ``schemas``    — explicit StructType schemas (single source of truth per table)
- ``sources``    — parquet catalog for driver testdata, JDBC source/sink, lake mgmt
- ``functions``  — scalar expression library (year_month, decodes, cutoffs, ...)
- ``operators``  — relational surface + LLM-data-pipeline ops (dedup, similarity,
                   text analysis, multimodal plumbing)
- ``plans``      — driver-level plan steps: incremental partition rebuild,
                   run-ledger/lineage, reconciliation
- ``streaming``  — Structured Streaming CDC/windowed-agg equivalents
- ``pipelines``  — end-to-end compositions mirroring the reference's two pipelines
- ``workload``   — seeded synthetic OLTP workload generator (CDC round-trip tests)
- ``queries``    — registry mapping query names -> (Spark callable, DuckDB oracle)
"""

__version__ = "0.1.0"
