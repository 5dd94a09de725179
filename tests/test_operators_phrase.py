"""Exact phrase matching (operators/index.py:phrase_match)."""

import pytest

from geohash_dotnet_spark.operators import phrase_match

SCHEMA = "doc_id long, text string"


def _hits(spark, texts, phrase):
    df = spark.createDataFrame(list(enumerate(texts)), SCHEMA)
    return {r["doc_id"]: (r["n_occurrences"], r["first_pos"])
            for r in phrase_match(df, phrase).collect()}


def test_basic_match(spark):
    out = _hits(spark, ["the quick brown fox", "brown the quick", "quick brown"],
                "quick brown")
    assert out == {0: (1, 2), 2: (1, 1)}


def test_overlapping_occurrences(spark):
    """'a a a a' contains 'a a' at starts 1, 2, 3 — overlapping starts
    all count (positional semantics, not string-replace semantics)."""
    out = _hits(spark, ["a a a a"], "a a")
    assert out == {0: (3, 1)}


def test_single_token_phrase(spark):
    out = _hits(spark, ["x y x", "y y", "z"], "x")
    assert out == {0: (2, 1)}


def test_case_and_whitespace_normalized(spark):
    """The phrase and the text share the lowercase whitespace tokenizer."""
    out = _hits(spark, ["The  QUICK   Brown fox"], "quick BROWN")
    assert out == {0: (1, 2)}


def test_phrase_longer_than_doc(spark):
    out = _hits(spark, ["a b"], "a b c")
    assert out == {}


def test_adjacency_required(spark):
    out = _hits(spark, ["quick red brown"], "quick brown")
    assert out == {}


def test_zero_shuffle_plan(spark):
    df = spark.createDataFrame([(1, "a b c")], SCHEMA)
    plan = phrase_match(df, "a b")._jdf.queryExecution() \
        .executedPlan().toString()
    assert "Exchange" not in plan
    assert "Join" not in plan


def test_empty_phrase_rejected(spark):
    df = spark.createDataFrame([(1, "a")], SCHEMA)
    with pytest.raises(ValueError):
        phrase_match(df, "   ")


def test_quote_bearing_phrase(spark):
    """Tokens with apostrophes/backslashes must be escaped, not crash
    or corrupt the generated expression (SQL-literal injection)."""
    out = _hits(spark, ["o'reilly books here", "no match"], "o'reilly books")
    assert out == {0: (1, 1)}
    # the DuckDB twin escapes too (doubled quote)
    from geohash_dotnet_spark.operators.index import phrase_match_sql
    sql = phrase_match_sql("o'reilly books")
    assert "o''reilly" in sql
