"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

The real catalog lives in
``end_to_end_azure_databricks_data_engineering_project_spark/plans/queries.py`` — one entry per
operator from SURVEY.md §2 plus the LLM-data-pipeline extensions;
this module just re-exports it.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from end_to_end_azure_databricks_data_engineering_project_spark.plans import queries as _catalog


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: star-schema multi-join
    revenue rollup (fact ⋈ orders ⋈ customer ⋈ nation ⋈ region)."""
    return _catalog.q_star_join_revenue(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2 (+extensions)."""
    return _catalog.queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL oracle per query (omitted for the
    non-SQL-expressible ops → driver records a rows-only check)."""
    return _catalog.oracle_sql()
