"""A PySpark-native analytics engine with the query and data-processing
capabilities of the reference data-lake pipeline
(pedresnyman/Udacity-Datalake-Spark), re-expressed Spark-first.

The reference (see SURVEY.md) is a Sparkify star-schema ETL: JSON feeds in,
Hive-partitioned parquet out, with projections, filters, distinct-dedup,
equi / OR-predicate / timestamp joins, and timestamp-part derivation
(reference etl.py:23-173).  This package generalizes that surface into a
reusable library:

- ``session``    — pinned-timezone, AQE-enabled SparkSession factory
- ``schemas``    — explicit StructTypes (the reference's schema inference is
                   its biggest correctness hazard, SURVEY.md §1.2)
- ``sources``    — parquet/JSON readers, partitioned parquet writers
- ``functions``  — scalar helpers (decimal-exact money math, reference-compat
                   timestamp derivation, array/vector math)
- ``operators``  — composite operators: OR-predicate join decomposition,
                   dedup family (exact / MinHash-LSH / SimHash / n-gram
                   Jaccard), similarity search, text analysis, multimodal
                   column plumbing
- ``plans``      — the declared query surface (each query + its DuckDB oracle
                   SQL twin) and the ported reference pipelines
- ``streaming``  — Structured Streaming: windowed aggregation, session
                   windows, watermark dedup, foreachBatch parquet sink
"""

__version__ = "0.1.0"
