"""Local mirror of the driver's correctness gate (SURVEY.md §5.2.6).

For every ``queries()`` entry with an ``oracle_sql()`` counterpart, run the
Spark builder and the DuckDB SQL on the same sf directory and compare:
row count, schema (column names), and exact values (columns sorted by name,
rows sorted by all columns) — a strictly stronger check than the driver's
order-insensitive value hash.

Runs at sf0.001 by default (fast); set SPARK_GRAFT_CONTRACT_SF=/root/testdata/sf0.01
to mirror the driver's exact tier before committing.
"""

from __future__ import annotations

import os

import duckdb
import pandas as pd
import pytest

from sparklucene.driver_queries import TABLES, registry

SF_DIR = os.environ.get("SPARK_GRAFT_CONTRACT_SF", "/root/testdata/sf0.001")

ENTRIES = sorted(registry().items())


def duck_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    return con


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    if len(df):
        df = df.sort_values(by=list(df.columns), kind="mergesort")
    return df.reset_index(drop=True)


@pytest.mark.parametrize("name,pair", ENTRIES, ids=[n for n, _ in ENTRIES])
def test_contract(spark, name, pair):
    fn, sql = pair
    sdf = fn(spark, SF_DIR).toPandas()
    if sql is None:
        assert len(sdf) >= 0  # rows-only check, like the driver
        return
    con = duck_connection(SF_DIR)
    odf = con.execute(sql).df()
    assert sorted(sdf.columns) == sorted(odf.columns), \
        f"schema mismatch: spark={sorted(sdf.columns)} oracle={sorted(odf.columns)}"
    assert len(sdf) == len(odf), f"row count: spark={len(sdf)} oracle={len(odf)}"
    for c in sdf.columns:
        sk, ok = sdf[c].dtype.kind, odf[c].dtype.kind
        assert sk == ok or {sk, ok} <= {"i", "u"}, \
            f"dtype kind mismatch on {c}: spark={sdf[c].dtype} oracle={odf[c].dtype}"
    s, o = canon(sdf), canon(odf.astype({c: sdf[c].dtype for c in sdf.columns
                                         if c in odf.columns}, errors="ignore"))
    pd.testing.assert_frame_equal(s, o, check_exact=True, check_dtype=False)


def test_entry_smoke(spark):
    import __spark_entry__ as se

    out = se.entry(spark).collect()
    assert len(out) > 0
    assert {"doc_id", "score"} <= set(out[0].asDict())
