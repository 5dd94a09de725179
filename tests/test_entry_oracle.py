"""Driver-contract conformance: run every ``queries()`` entry at sf0.01 on
Spark AND its ``oracle_sql()`` twin in DuckDB, compare row count + schema +
order-insensitive values (the driver's CORRECTNESS gate, replicated here)."""

import math

import duckdb
import pytest

import __spark_entry__ as E

SF = "/root/testdata/sf0.01"
TABLES = ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split()


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')")
    return c


def _canon(val):
    if val is None:
        return "<null>"
    if isinstance(val, float):
        if math.isnan(val):
            return "nan"
        return f"{val:.17g}"
    if isinstance(val, (list, tuple)):
        return "[" + ",".join(_canon(v) for v in val) + "]"
    return str(val)


def _rows_to_set(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = {}
    for r in rows:
        key = "|".join(_canon(r[i]) for i in order)
        out[key] = out.get(key, 0) + 1
    return out


@pytest.mark.parametrize("name", sorted(E.oracle_sql().keys()))
def test_query_matches_oracle(spark, con, name):
    q = E.queries()[name]
    sdf = q(spark, SF)
    s_cols = sdf.columns
    s_rows = [tuple(r) for r in sdf.collect()]

    rel = con.sql(E.oracle_sql()[name])
    d_cols = rel.columns
    d_rows = rel.fetchall()

    assert sorted(s_cols) == sorted(d_cols), (s_cols, d_cols)
    assert len(s_rows) == len(d_rows), f"{name}: {len(s_rows)} vs {len(d_rows)}"
    s_set = _rows_to_set(s_cols, s_rows)
    d_set = _rows_to_set(d_cols, d_rows)
    if s_set != d_set:
        only_s = [k for k in s_set if s_set[k] != d_set.get(k)][:5]
        only_d = [k for k in d_set if d_set[k] != s_set.get(k)][:5]
        pytest.fail(f"{name}: value mismatch\n spark-only={only_s}\n duck-only={only_d}")


def test_entry_smoke(spark):
    df = E.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert df.columns == ["tile1", "lang", "n_pages", "avg_quality"]


@pytest.mark.parametrize("name", sorted(set(E.queries()) - set(E.oracle_sql())))
def test_non_sql_queries_run(spark, name):
    df = E.queries()[name](spark, SF)
    assert df.count() >= 0


def test_window_boundary():
    """The external driver value-checks only the FIRST 50 ``queries()``
    keys (insertion order). Every key that is new this round, changed
    this round, or was red/never-checked before MUST sit inside that
    window — pin the set so a careless registry edit fails loudly."""
    keys = list(E.queries())
    window = set(keys[:50])
    must_check = {
        # never driver-checked before r4 / red in r3 / changed in r3
        "vocab_topk", "url_canonical_dedup", "extract_text",
        "pack_shards", "semantic_dedup", "ivf_cosine_topk",
        "url_host_stats",
        # changed in r4
        "quality", "decontaminate", "ngram_jaccard",
        "ngram_jaccard_capped", "events_asof",
        # new in r4
        "domain_quota", "domain_mixture", "sample_exact",
        "sample_exact_by_lang", "tile_clusters", "postings",
        "bm25_search", "bigram_ppl", "collocations", "snapshot_diff",
        "tile_flows", "kmeans_codebook", "char_entropy",
        "user_mobility", "host_pagerank", "dup_spans",
        "length_quantiles", "tile_anomaly", "dsir_weights",
        "paragraph_dedup", "rect_join", "cotravel_pairs", "bpe_merges",
        "zonal_stats", "phrase_search", "corridor_join", "k_anon_tiles",
        "snap_route", "host_hits",
    }
    missing = must_check - window
    assert not missing, f"must-check keys outside the 50-key window: {missing}"
