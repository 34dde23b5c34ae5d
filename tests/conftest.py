from __future__ import annotations

import os
import sys

import numpy as np
import pandas as pd
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

SF_SMOKE = os.environ.get("SPARK_GRAFT_SMOKE_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    from sparklucene.session import get_spark

    s = get_spark(app_name="sparklucene-tests", cores=8, shuffle_partitions=8)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def corpus_pdf() -> pd.DataFrame:
    """Small deterministic corpus in the BASELINE input shape."""
    import duckdb

    pdf = duckdb.sql(
        f"select * from read_parquet('{SF_SMOKE}/documents.parquet') order by doc_id"
    ).df()
    return pd.DataFrame({
        "repo": pdf["source"],
        "path": "doc/" + pdf["doc_id"].astype(str) + ".txt",
        "commit": pdf["doc_id"].astype(str),
        "lang": pdf["lang"],
        "content": pdf["text"],
        "doc_id": pdf["doc_id"].astype("int64"),
    })


@pytest.fixture(scope="session")
def rng() -> np.random.Generator:
    return np.random.default_rng(42)
