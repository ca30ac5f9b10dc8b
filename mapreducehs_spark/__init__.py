"""mapreducehs_spark — a PySpark-native analytics engine.

A ground-up re-expression of the capabilities of the reference engine
``soulomoon/mapreducehs`` (a typed Haskell MapReduce kernel; see
SURVEY.md) on Apache Spark:

- ``pipeline``   — the reference-parity Mapper/Reducer chain API
  (reference ``src/Core/MapReduceC.hs:22-44``), lowered to DataFrame ops.
- ``session``    — SparkSession factory tuned for local testing while
  keeping 100 TB-cluster posture (AQE, skew join, UTC, Arrow).
- ``sources``    — table catalog over the parquet testdata plus generic
  readers (parquet/csv/json/orc/text/binary).
- ``operators``  — relational and LLM-data-pipeline operators: joins
  (incl. as-of/range), dedup (exact/MinHash/SimHash/Jaccard/embedding),
  similarity search, text analysis, multimodal column plumbing.
- ``functions``  — vector/scalar helpers built on pyspark.sql.functions.
- ``streaming``  — Structured Streaming surface over the events table.
- ``queries``    — the declared query inventory with DuckDB oracle SQL.
"""

__version__ = "0.1.0"

from mapreducehs_spark.session import get_spark  # noqa: F401
