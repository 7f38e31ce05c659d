"""Driver-gate rehearsal: every queries() entry with an oracle must match
DuckDB on sf0.01 (row count + order-insensitive values + pandas dtype
class), per the contract in __spark_entry__.py.

The dtype-class check matters: the driver materializes BOTH sides as pandas
DataFrames, where DuckDB HUGEINT (un-cast SUM of BIGINT) lands as float64
while Spark's long lands as int64 — a value-hash mismatch that
``fetchall()`` + ``repr()`` comparison can never see (round-1 lesson)."""

from __future__ import annotations

import math

import duckdb
import pandas as pd
import pytest

import __spark_entry__ as entrymod

SF_DIR = "/root/testdata/sf0.01"
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="module")
def ddb():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')")
    return con


def _dtype_class(dt) -> str:
    k = getattr(dt, "kind", "O")
    if k in "iu":
        return "int"
    if k == "f":
        return "float"
    if k == "b":
        return "bool"
    if k == "M":
        return "datetime"
    return "obj"


def _norm_pdf(pdf: pd.DataFrame):
    pdf = pdf[sorted(pdf.columns)]
    out = []
    for r in pdf.itertuples(index=False):
        vals = []
        for v in r:
            if isinstance(v, float):
                v = round(v, 9) if math.isfinite(v) else v
            vals.append(repr(v))
        out.append(tuple(vals))
    return sorted(out)


ORACLE_NAMES = sorted(entrymod.oracle_sql().keys())


@pytest.mark.parametrize("name", ORACLE_NAMES)
def test_query_matches_oracle(spark, ddb, name):
    q = entrymod.queries()[name]
    spdf = q(spark, SF_DIR).toPandas()
    dpdf = ddb.execute(entrymod.oracle_sql()[name]).fetchdf()

    assert sorted(spdf.columns) == sorted(dpdf.columns), f"{name}: column names differ"
    assert len(spdf) == len(dpdf), f"{name}: row count {len(spdf)} vs {len(dpdf)}"
    for c in spdf.columns:
        sk, dk = _dtype_class(spdf[c].dtype), _dtype_class(dpdf[c].dtype)
        assert sk == dk, f"{name}.{c}: pandas dtype class {sk} (spark) vs {dk} (oracle)"
    assert _norm_pdf(spdf) == _norm_pdf(dpdf), f"{name}: values differ"


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    assert df.count() > 0


def test_all_queries_run(spark):
    """Queries without an oracle still must execute and return rows."""
    for name, q in entrymod.queries().items():
        if name in ORACLE_NAMES:
            continue
        assert q(spark, SF_DIR).count() > 0, name
