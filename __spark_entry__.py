"""Driver contract for the spark-graft builder (PySpark target).

entry()      — flagship query smoke check at sf0.001
queries()    — name -> (spark, sf_dir) -> DataFrame, from the registry
oracle_sql() — name -> DuckDB SQL twin (omitted for non-SQL-expressible ops)

The real implementation lives in terrorblade_spark/ (queries register
themselves in terrorblade_spark.registry on import).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (pricing summary agg) on /root/testdata/sf0.001."""
    from terrorblade_spark.queries.relational import q01_pricing_summary

    return q01_pricing_summary(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from terrorblade_spark.registry import get_queries

    return get_queries()


def oracle_sql() -> dict[str, str]:
    from terrorblade_spark.registry import get_oracles

    return get_oracles()
