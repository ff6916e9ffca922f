"""commerce_sessionization_spark — a PySpark-native analytics engine.

A from-scratch, Spark-first implementation of the query and data-processing
capabilities of the reference repo ``f-lab-edu/commerce-sessionization``
(user-behavior sessionization over e-commerce clickstream events), extended
with the operators a large-scale training-data pipeline needs: deduplication,
similarity search, multimodal column plumbing, and text analysis.

Everything is declarative DataFrame/SQL so Catalyst + Tungsten pick the
physical strategy; Python UDFs appear only where built-ins genuinely cannot
express the semantics (and then always Arrow-batched pandas UDFs).

Layout
------
- ``session``    — tuned SparkSession builder (AQE, UTC, dynamic overwrite)
- ``schemas``    — explicit StructType constants (never inferred)
- ``sources``    — csv/parquet readers & partitioned writers; testdata loader
- ``operators``  — sessionization core + dedup/similarity/text/multimodal
- ``functions``  — reusable column expressions (cosine, hashing, text stats)
- ``plans``      — named headline queries (bench + driver entry points)
- ``streaming``  — Structured Streaming sessionization
"""

__version__ = "0.1.0"
