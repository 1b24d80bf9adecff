"""crime_spark_ml_spark — a PySpark-native analytics engine.

A from-scratch re-expression of the capabilities of the reference repo
MHassaanButt/Crime-Spark-ML (batch crime analytics + ML pipeline +
micro-batch streaming; see SURVEY.md) as an idiomatic Apache Spark
engine: DataFrame/Spark SQL plans optimized by Catalyst, MLlib for the
ML surface, Structured Streaming for the stream consumer, plus the
large-scale training-data-pipeline operators (dedup, similarity search,
text analysis, multimodal columns) such an engine needs at 100 TB scale.

Layout
------
- ``session``    SparkSession factory with scale-aware defaults
- ``sources``    table catalog (explicit schemas) + readers/writers
- ``plans``      named query plans + the DuckDB-oracle registry
- ``operators``  reusable relational/dedup/similarity/text operators
- ``functions``  column-expression helpers (text, vectors, hashing)
- ``ml``         the reference's ML pipeline re-built on pyspark.ml
- ``streaming``  wire-format parsers + Structured Streaming consumers
"""

__version__ = "0.1.0"
