"""k8e_fetch_spark — a PySpark-native analytics engine.

A brand-new engine with the query/data-processing capabilities of the
reference ETL pipeline (k8e811/k8e-fetch: catalog-scan -> regex select ->
incremental sync -> decode/repair -> load -> dedup-compress), re-expressed
Spark-first (DataFrame/SQL/Catalyst/Structured Streaming), plus
LLM-data-pipeline operators (dedup, similarity search, multimodal columns,
text analysis) designed for 100 TB scale.

Layout:
    session       SparkSession factory tuned for the workload
    sources/      catalog scan, manifest filters, CSV/TSV/zip readers
    operators/    projection/substitution, dedup/merge, repair, text, similarity
    functions/    column-expression helpers (vector math, hashing, text)
    plans/        declarative pipeline spec (cfg.yaml-equivalent) -> DataFrame plans
    streaming/    Structured Streaming windows/watermark operators
    queries/      the declared query surface (drives __spark_entry__.py)
"""

__version__ = "0.1.0"
