"""logistics_data_pipeline_project_spark — a PySpark-native analytics engine.

A from-scratch rebuild of the query & data-processing capabilities of the
reference repo RBENJAMINFRANKLIN/logistics-data-pipeline-project (a Snowflake +
dbt + Snowpark medallion pipeline; see SURVEY.md), re-expressed as idiomatic
Spark: DataFrame/SQL logical plans optimized by Catalyst, columnar Parquet
storage, broadcast/sort-merge joins picked by AQE, and Arrow-batched Pandas
UDFs only where built-ins cannot express the semantics.

Layout
------
- ``session``    : SparkSession factory tuned for both local test and cluster scale.
- ``sources``    : readers with option parity (CSV/JSON/seeds, file metadata).
- ``functions``  : scalar helpers (lenient casts, metric macros — SURVEY §2.8/U3).
- ``operators``  : engine ops — merge/upsert, SCD2, incremental watermark,
                   valid/error router, dedup family, similarity search, text
                   analysis, multimodal plumbing (SURVEY §2.9, Phase 5).
- ``models``     : the logistics star-schema silver/gold model library
                   (SURVEY §2.3–§2.7 domain queries).
- ``plans``      : dbt-style model runner (ref-graph toposort, materializations,
                   audit log — SURVEY §3.2).
- ``streaming``  : Structured Streaming variants of the landing pipeline
                   (SURVEY §2.10).
- ``queries``    : the driver-facing query catalog with DuckDB oracle SQL.
"""

__version__ = "0.1.0"
