"""weather_data_pipeline_spark — a PySpark-native analytics engine.

A brand-new, Spark-first engine with the query and data-processing
capabilities of the reference pipeline (``jackliuuu/weather_data_pipeline``,
a pandas+Athena weather ETL: see SURVEY.md), generalized to a full
relational + LLM-data-pipeline operator surface designed for 100 TB scale:

- ``session``     — SparkSession factory (AQE, UTC, tuned shuffle partitions)
- ``schemas``     — explicit StructTypes (never infer at scale)
- ``sources``     — parquet/json readers, partitioned writers, HTTP ingest
- ``functions``   — scalar/map/text/vector column helpers (all JVM-side)
- ``operators``   — relational queries, windows, dedup, similarity, text ops
- ``streaming``   — Structured Streaming variants (file stream, latest-per-key)
- ``ml``          — GBT regression pipeline (reference's train/predict stage)
- ``pipeline``    — extract → stage → curate → train → predict composition

Everything is declared through the DataFrame/SQL API so Catalyst performs
pushdown, pruning, join selection, and AQE re-planning; Python UDFs appear
only where built-ins cannot express the semantics (and then Arrow-vectorized).
"""

__version__ = "0.1.0"
