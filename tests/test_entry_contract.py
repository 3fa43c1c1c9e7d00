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


# the driver's correctness gate is POSITIONAL over the first 50 queries()
# entries; this is the frozen round-5/6 window. Entries past 50 get their
# green evidence from the committed tools/check_oracles.py sweep log
# instead (BENCH/ORACLE_SWEEP_r06.log). An accidental dict reorder would
# silently swap which entries the driver validates — freeze it here.
FIRST_50 = [
    "dedup_exact", "distinct_partkeys", "freq_returnflag",
    "quantity_quantiles", "membership_custkey_xorf",
    "membership_suppkey_ribbon", "membership_partkey_sbbf",
    "membership_orderkey_cogrouped", "bloom_orderkey",
    "cosine_near_dups_lsh", "ivf_ann_topk", "pq_ann_topk", "ivfpq_ann_topk",
    "media_features", "media_resize", "quality_scores", "lang_id",
    "doc_fingerprints", "simhash_near_pairs", "stratified_sample",
    "curated_training_set", "normalized_docs", "repetition_scores",
    "lm_scores", "decontaminate", "minhash_signatures",
    "minhash_km_signatures", "lsh_candidate_pairs", "ngram_jaccard",
    "cosine_topk", "cosine_near_dups", "prefiltered_join", "user_sessions",
    "asof_join", "hypertable_rollup", "source_quota", "type_overlap_matrix",
    "mg_event_types", "range_join", "dedup_clusters", "salted_lang_counts",
    "cms_event_types", "hll_users", "hll_users_by_type", "tdigest_price",
    "kll_values", "theta_user_overlap", "simhash_docs",
    "rolling_fingerprints", "ann_lsh_topk",
]
OVERFLOW = ["bpe_token_counts", "token_counts", "events_hourly",
            "event_props", "latest_events", "train_split", "top_users",
            "dedup_incremental"]


def test_first_50_entry_window_is_frozen():
    """The driver gate validates queries() positions 1-50; new entries must
    slot AFTER position 50 (grow OVERFLOW), never displace the frozen set."""
    names = list(entrymod.queries())
    assert names[:50] == FIRST_50, (
        "queries() first-50 window changed — the driver's positional "
        "correctness gate would silently validate a different entry set. "
        "Append new entries after position 50.")
    assert names[50:50 + len(OVERFLOW)] == OVERFLOW
