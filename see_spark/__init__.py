"""see_spark — a PySpark-native analytics/crawl engine.

A from-scratch rebuild of the query + data-processing capabilities of the
``see`` search engine (reference: tmaciejewski/see, Erlang/OTP), re-expressed
as Iceberg-style snapshot tables + Spark DataFrame pipelines:

- URL frontier + fetch scheduler (bloom URL-seen, per-host politeness,
  robots cache, priority queue)  — ``see_spark.operators.frontier`` / ``crawl``
- Interleaved text+media document parsing into span sequences
  — ``see_spark.functions.udfs`` (vectorized pandas UDFs over pure kernels)
- Inverted index + TF-IDF conjunctive search
  — ``see_spark.operators.indexer`` / ``search``
- Training-data pipeline extras (dedup, similarity search, text stats,
  multimodal plumbing) — ``see_spark.operators.dedup`` etc.

All reference-semantics decisions cite file:line of the reference repo in
docstrings; the pure kernels live in ``see_spark.core`` with zero pyspark
imports so the pytest oracle shares them.
"""

__version__ = "0.1.0"
