"""Layer-3 driver-contract test: every queries() entry with an
oracle_sql() must match DuckDB exactly (row count + sorted column names +
values), mimicking the driver's order-insensitive value-hash compare."""

import math
import os

import duckdb
import pytest

import __spark_entry__ as E
from tests.conftest import SF_MED, SF_SMALL

SF_DIR = os.environ.get("SPARK_GRAFT_CONTRACT_SF", SF_MED)

_QUERIES = E.queries()
_ORACLES = E.oracle_sql()
SQL_KEYS = sorted(_ORACLES)
ROWS_ONLY_KEYS = sorted(set(_QUERIES) - set(_ORACLES))


def _canon(v):
    if v is None:
        return None
    if isinstance(v, bool):
        return bool(v)
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return float(v)
    if isinstance(v, int):
        return int(v)
    try:
        import numpy as np

        if isinstance(v, np.bool_):
            return bool(v)
        if isinstance(v, np.integer):
            return int(v)
        if isinstance(v, np.floating):
            return _canon(float(v))
    except ImportError:
        pass
    return str(v)


def _normalize(pdf):
    cols = sorted(pdf.columns)
    rows = [tuple(_canon(v) for v in row)
            for row in pdf[cols].itertuples(index=False)]
    return cols, sorted(rows, key=lambda r: tuple(
        (x is None, str(type(x)), x) for x in r))


def _duck(sql: str):
    con = duckdb.connect()
    for t in ("region", "nation", "customer", "supplier", "part",
              "orders", "lineitem", "events", "documents", "embeddings"):
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM "
                f"'{SF_DIR}/{t}.parquet'")
    return con.sql(sql).df()


def test_all_oracle_keys_have_queries():
    missing = set(_ORACLES) - set(_QUERIES)
    assert not missing


@pytest.mark.parametrize("key", SQL_KEYS)
def test_query_matches_duckdb(spark, key):
    got_df = _QUERIES[key](spark, SF_DIR).toPandas()
    want_df = _duck(_ORACLES[key])
    g_cols, g_rows = _normalize(got_df)
    w_cols, w_rows = _normalize(want_df)
    assert g_cols == w_cols, f"{key}: columns {g_cols} != {w_cols}"
    assert len(g_rows) == len(w_rows), \
        f"{key}: rowcount {len(g_rows)} != {len(w_rows)}"
    if g_rows != w_rows:
        diffs = [(a, b) for a, b in zip(g_rows, w_rows) if a != b][:5]
        raise AssertionError(f"{key}: value mismatch, first diffs: {diffs}")


# float-heavy queries re-checked at sf0.1: bigger sums exercise the
# quantizer's half-grid robustness (the round() divergence that bit us
# only appears at this scale)
FLOAT_STRESS_KEYS = ["group_line_stats", "text_quality", "tpch_q1",
                     "broadcast_dim_join", "sim_topk_cosine",
                     "group_linefit_regr", "corpus_filter",
                     "dedup_embedding_cosine", "sim_ivf_topk",
                     "ohem_topk_sum", "html_strip", "html_main_block",
                     "text_repetition", "tfidf_topk",
                     "quality_classifier", "approx_distinct_hll",
                     "tpch_q5", "tpch_q10", "tpch_q14",
                     # r7 keys whose parity rests on ln()/floor micro
                     # rounding or threshold comparisons at quantized
                     # boundaries — the class this sf0.1 stress exists
                     # for
                     "dsir_topk", "classifier_auc", "gate_ablation",
                     "corpus_overlap_minhash"]


@pytest.mark.parametrize("key", FLOAT_STRESS_KEYS)
def test_query_matches_duckdb_sf01(spark, key):
    sf = os.path.join(os.path.dirname(SF_DIR.rstrip("/")), "sf0.1")
    got_df = _QUERIES[key](spark, sf).toPandas()
    con = duckdb.connect()
    for t in ("region", "nation", "customer", "supplier", "part",
              "orders", "lineitem", "events", "documents", "embeddings"):
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")
    want_df = con.sql(_ORACLES[key]).df()
    g_cols, g_rows = _normalize(got_df)
    w_cols, w_rows = _normalize(want_df)
    assert g_cols == w_cols and g_rows == w_rows


@pytest.mark.parametrize("key", ROWS_ONLY_KEYS)
def test_rows_only_queries_run(spark, key):
    df = _QUERIES[key](spark, SF_SMALL)
    assert df.count() > 0


def test_entry_smoke(spark):
    df = E.entry(spark)
    n = df.count()
    assert n > 0
    assert set(df.columns) == {"doc_id", "offset", "kind", "text",
                               "media_ref"}
