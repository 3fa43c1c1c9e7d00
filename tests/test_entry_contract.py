"""Driver-contract sanity: entry() runs and returns rows; a representative
subset of queries() matches oracle_sql() through DuckDB at sf0.001 (the full
26-entry sweep at sf0.01/0.1 runs via tools/check_oracles.py)."""

import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod
from tools.check_oracles import normalize

SF_DIR = "/root/testdata/sf0.001"

SUBSET = ["dedup_exact", "freq_returnflag", "membership_custkey_xorf",
          "token_counts", "minhash_signatures", "cosine_topk",
          "quantity_quantiles", "cms_event_types"]


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for name in ["region", "nation", "customer", "supplier", "part", "orders",
                 "lineitem", "events", "documents", "embeddings"]:
        c.execute(f"CREATE VIEW {name} AS SELECT * FROM "
                  f"'{os.path.join(SF_DIR, name + '.parquet')}'")
    return c


def test_entry_returns_rows(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert {"partition_id", "num_keys", "mem_usage"} <= set(df.columns)


def test_every_query_has_callable():
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    assert len(qs) >= 25
    assert set(oracles) <= set(qs), "oracle without a query"
    assert len(oracles) >= 18, "most entries should be SQL-oracled"


@pytest.mark.parametrize("name", SUBSET)
def test_query_matches_oracle(spark, con, name):
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    sdf = qs[name](spark, SF_DIR).toPandas()
    odf = con.execute(oracles[name]).fetchdf()
    assert len(sdf) == len(odf), name
    assert sorted(sdf.columns) == sorted(odf.columns), name
    a, b = normalize(sdf), normalize(odf)
    assert a.columns.tolist() == b.columns.tolist(), name
    assert ((a.eq(b) | (a.isna() & b.isna())).all(axis=1)).all(), name
