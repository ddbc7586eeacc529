"""Driver-contract conformance: every queries() entry runs; every
oracle_sql() twin produces the identical order-insensitive row
multiset (the same comparison CORRECTNESS_r{N}.json gates on)."""

import math

import duckdb
import pytest

import __spark_entry__ as entry_mod

SF_DIR = "/root/testdata/sf0.001"
TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    return con


def _norm_cell(v):
    import datetime

    import numpy as np
    import pandas as pd

    if isinstance(v, np.ndarray):
        v = v.tolist()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_norm_cell(x) for x in v) + "]"
    if v is None:
        return "nan"
    if isinstance(v, np.generic):
        v = v.item()
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        # driver-style value hash tolerance: exact repr after our own
        # in-query rounding
        return repr(round(v, 9))
    if isinstance(v, datetime.datetime):
        return "nan" if pd.isna(v) else v.isoformat()
    if isinstance(v, datetime.date):
        # align date with midnight Timestamp from pandas materialization
        return v.isoformat() + "T00:00:00"
    if hasattr(v, "isoformat"):
        return v.isoformat()
    return repr(v)


def _rowset(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(_norm_cell(r[i]) for i in order) for r in rows)


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    rows = df.collect()
    assert len(rows) >= 0
    assert "scene_id" in df.columns


def test_all_queries_run(spark):
    qs = entry_mod.queries()
    assert len(qs) >= 25
    for name, fn in qs.items():
        df = fn(spark, SF_DIR)
        assert df.columns, name
        n = df.limit(5).count()
        assert n >= 0, name


@pytest.mark.parametrize("name", sorted(entry_mod.oracle_sql()))
def test_oracle_parity(spark, duck, name):
    qs = entry_mod.queries()
    sql = entry_mod.oracle_sql()[name]
    sdf = qs[name](spark, SF_DIR)
    spark_cols = sdf.columns
    spark_rows = [tuple(r) for r in sdf.collect()]

    # materialize through pandas like the driver does — this is what
    # surfaces DuckDB HUGEINT->float64 coercions (r02 json_props bug)
    rel = duck.sql(sql)
    pdf = rel.df()
    duck_cols = list(pdf.columns)
    duck_rows = [tuple(r) for r in pdf.itertuples(index=False, name=None)]

    assert sorted(spark_cols) == sorted(duck_cols), name
    assert len(spark_rows) == len(duck_rows), f"{name}: {len(spark_rows)} vs {len(duck_rows)}"
    got = _rowset(spark_cols, spark_rows)
    exp = _rowset(duck_cols, duck_rows)
    mismatches = [i for i, (g, e) in enumerate(zip(got, exp)) if g != e][:5]
    assert got == exp, f"{name}: first mismatches {[(got[i], exp[i]) for i in mismatches]}"
