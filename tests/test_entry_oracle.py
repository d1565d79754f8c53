"""Replica of the driver's correctness gate: run every __spark_entry__
query through BOTH the Spark engine and DuckDB oracle SQL at sf0.01 and
compare row count, column names, and order-insensitive values."""

import math

import duckdb
import pytest

import __spark_entry__ as entry_mod

SF_DIR = "/root/testdata/sf0.01"
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    return c


def _norm(v):
    # The driver canonicalizes with pandas sort_values over every column,
    # which hashes cells — list/dict/array cells crash it (round-3's only
    # red row, ann_pq_codes). Reject them here so the replica fails the
    # same way the driver would.
    assert not isinstance(v, (list, dict, set, bytearray)), (
        f"non-scalar cell {type(v).__name__}: the driver's canonicalizer "
        f"cannot hash this — emit a flat scalar column instead")
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        # collapse -0.0 / 0.0 and representation noise
        return round(v, 9)
    return v


def _rows_to_set(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(_norm(r[i]) for i in order) for r in rows)


ALL = sorted(entry_mod.queries().keys())


@pytest.mark.parametrize("name", ALL)
def test_query_matches_oracle(spark, con, name):
    q = entry_mod.queries()[name]
    sql = entry_mod.oracle_sql().get(name)
    sdf = q(spark, SF_DIR)
    srows = sdf.collect()
    scols = sdf.columns
    if sql is None:
        assert len(srows) >= 0  # rows-only check
        return
    ddf = con.sql(sql)
    drows = ddf.fetchall()
    dcols = [d[0] for d in ddf.description]
    assert sorted(scols) == sorted(dcols), f"{name}: column names differ"
    assert len(srows) == len(drows), f"{name}: row count differs"
    a = _rows_to_set(scols, [[row[c] for c in scols] for row in srows])
    b = _rows_to_set(dcols, drows)
    assert a == b, f"{name}: values differ\nspark: {a[:5]}\nduck:  {b[:5]}"


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    rows = df.collect()
    assert len(rows) >= 0
    assert df.columns == ["doc_id", "score"]


def test_inventory_is_exactly_50_unique_keys():
    """The driver checks at most 50 queries; the inventory must be
    exactly 50 UNIQUE keys with a matching oracle for each (a duplicated
    registry name would silently shrink dict coverage)."""
    q = entry_mod.queries()
    o = entry_mod.oracle_sql()
    assert len(q) == 50
    assert set(o) == set(q)
    from textindexing_spark.entry_queries import _REGISTRY
    names = [name for name, _, _ in _REGISTRY]
    assert len(names) == len(set(names)) == 50
