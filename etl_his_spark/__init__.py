"""etl_his_spark — a PySpark-native analytics engine.

A brand-new, Spark-first implementation of the query and data-processing
capabilities of the reference ETL application (``sinergia-digital-projects/
etl-his``, surveyed in SURVEY.md), extended with the operators a
large-scale training-data pipeline needs (dedup families, similarity
search, text analysis, multimodal plumbing).

Layout:

- ``session``    — tuned SparkSession factory (AQE, UTC, Arrow).
- ``schemas``    — explicit StructTypes for every table (no inference).
- ``functions``  — scalar column functions (text cleaning, gender lookup,
                   vector math) built from ``pyspark.sql.functions``.
- ``operators``  — relational + dataflow operators (joins, unpivot, dedup,
                   surrogate keys, similarity search, multimodal).
- ``sources``    — readers and atomic stage-then-publish writers.
- ``plans``      — end-to-end pipelines (the flagship HIS-shaped ETL,
                   TPC-H-style analytical queries).
- ``streaming``  — Structured Streaming jobs (windowed event aggregation).
"""

__version__ = "0.1.0"
