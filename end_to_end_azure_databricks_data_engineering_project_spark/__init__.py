"""PySpark-native incremental lakehouse engine.

A brand-new engine (not a port) with the query and data-processing
capabilities of ``pninad9/End-to-End-Azure-Databricks-Data-Engineering-Project``
(read-only reference at /root/reference): metadata-driven incremental
watermark ingestion, streaming file ingestion with schema tracking and a
rescue column, reusable cleansing transforms, SCD1/SCD2 CDC dimensional
modeling, data-quality expectations, an analytics query surface over the
star schema, and LLM-training-data pipeline operators (dedup, similarity
search, text analysis, multimodal plumbing) designed for 100 TB scale.

Layout:
  sources/    readers, watermark store, incremental ingest, autoloader
              emulation, versioned managed tables  (≙ ADF + Autoloader)
  operators/  cleansing transforms, SCD1/SCD2 CDC, expectations, dedup,
              similarity, text analysis, multimodal  (≙ silver/gold + DLT)
  functions/  scalar/aggregate helper expressions
  plans/      the analytics query catalog (driver-checked surface)
  streaming/  silver/gold flow registry + DAG runner
"""

from end_to_end_azure_databricks_data_engineering_project_spark.session import get_spark

__all__ = ["get_spark"]
__version__ = "0.1.0"
