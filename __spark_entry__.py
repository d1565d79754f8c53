"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash -> CORRECTNESS_r{N}.json).

Engine: textindexing_spark (see SURVEY.md; implementations under
textindexing_spark/, query inventory in textindexing_spark/entry_queries.py).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

_REPO = os.path.dirname(os.path.abspath(__file__))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

from pyspark.sql import DataFrame, SparkSession  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: build the inverted index
    over the documents table and answer a BM25 top-10 ranked query."""
    from textindexing_spark._pkg import ensure_shipped
    from textindexing_spark.entry_queries import flagship

    ensure_shipped(spark)
    return flagship(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md section 2 (plus the
    training-pipeline extensions). Each callable takes (spark, sf_dir)."""
    from textindexing_spark._pkg import ensure_shipped
    from textindexing_spark.entry_queries import QUERIES

    def _wrap(fn):
        def run(spark, sf_dir):
            ensure_shipped(spark)
            return fn(spark, sf_dir)
        return run

    return {name: _wrap(fn) for name, fn in QUERIES.items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL equivalent for each query (the correctness
    oracle). Keys without an entry get a weaker rows-only check."""
    from textindexing_spark.entry_queries import ORACLE_SQL

    return dict(ORACLE_SQL)
