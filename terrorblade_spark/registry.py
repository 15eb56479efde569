"""Query + oracle registry.

Every operator/query the engine claims (SURVEY.md §2) registers here as
  - a Spark builder  ``(SparkSession, sf_dir) -> DataFrame``
  - optionally a DuckDB oracle SQL string over the same parquet views.

``__spark_entry__.py`` exposes this registry to the driver, which runs
both sides at sf=0.01 and hash-compares results. Column names and value
determinism (decimal-exact sums, tie-broken orderings) are part of each
query's contract — see queries/*.py.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Optional

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

_QUERIES: dict[str, QueryFn] = {}
_ORACLES: dict[str, str] = {}


def query(name: str, oracle: Optional[str] = None) -> Callable[[QueryFn], QueryFn]:
    """Register a named query; ``oracle`` is DuckDB SQL or None for
    non-SQL-expressible ops (driver then does a rows-only check)."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in _QUERIES:
            raise ValueError(f"duplicate query name {name!r}")
        _QUERIES[name] = fn
        if oracle is not None:
            _ORACLES[name] = oracle
        return fn

    return deco


def _load_all() -> None:
    # import for side effect: modules register their queries
    from terrorblade_spark.queries import (  # noqa: F401
        dedup,
        llmdata,
        multimodal,
        relational,
        semantic,
        sessions,
        streaming,
        telegram,
        text,
        vector,
        windows,
    )


def get_queries() -> dict[str, QueryFn]:
    _load_all()
    return dict(_QUERIES)


def get_oracles() -> dict[str, str]:
    _load_all()
    return dict(_ORACLES)
