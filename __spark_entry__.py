"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash -> CORRECTNESS_r{N}.json).

All real logic lives in ``sparklucene.driver_queries`` — a registry of
(spark builder, DuckDB oracle) pairs, one per implemented operator from
SURVEY.md §2. ``tests/test_driver_contract.py`` mirrors the driver's
comparison locally so parity is verified before every commit.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from sparklucene import driver_queries


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: two-phase hydrated BM25
    top-10 for OR(spark, merge, join) through the full engine path
    (inverted index -> MAXSCORE pruning -> global merge -> hydration)."""
    return driver_queries.flagship(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: fn for name, (fn, _sql) in driver_queries.registry().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for each queries() entry (omitted for
    non-SQL-expressible ops -> driver records a rows-only check)."""
    return {name: sql for name, (_fn, sql) in driver_queries.registry().items()
            if sql is not None}
