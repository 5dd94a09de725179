"""Distributed BPE tokenizer training (operators/bpe.py)."""

import pytest

from geohash_dotnet_spark.operators import bpe_merges

SCHEMA = "doc_id long, text string"


def _merges(spark, texts, **kw):
    df = spark.createDataFrame(list(enumerate(texts)), SCHEMA)
    return [tuple(r) for r in bpe_merges(df, **kw).orderBy("rank").collect()]


def test_hand_corpus(spark):
    """ab(x2) + abc(x1): round 1 merges (a,b) with count 3; round 2
    merges (ab,c) with count 1; round 3 finds no pairs and stops."""
    out = _merges(spark, ["ab ab abc"], n_merges=5)
    assert out == [(1, "a", "b", "ab", 3), (2, "ab", "c", "abc", 1)]


def test_greedy_nonoverlapping(spark):
    """'aaa' under merge (a,a) must become 'aa a' (greedy left-to-right,
    non-overlapping), so round 2's top pair is (aa, a) — the reference
    BPE scan order, and the fold's last-token check in action."""
    out = _merges(spark, ["aaa aaa"], n_merges=2)
    assert out == [(1, "a", "a", "aa", 4), (2, "aa", "a", "aaa", 2)]


def test_tiebreak_lexicographic(spark):
    """(a,b) and (c,d) tie at count 2 — the lexicographically smaller
    pair must win deterministically."""
    out = _merges(spark, ["ab cd", "cd ab"], n_merges=1)
    assert out == [(1, "a", "b", "ab", 2)]


def test_merged_symbol_participates(spark):
    """After (e,r)->er, round 2 can pick a pair whose side IS the merged
    symbol — merges compose."""
    out = _merges(spark, ["er er er her her"], n_merges=2)
    # round 1: (e,r) appears in all 5 words -> count 5
    assert out[0] == (1, "e", "r", "er", 5)
    # round 2: (h, er) from the two 'her' words
    assert out[1] == (2, "h", "er", "her", 2)


def test_single_char_vocab_stops_early(spark):
    out = _merges(spark, ["a b c", "a b"], n_merges=4)
    assert out == []


def test_non_alpha_words_excluded(spark):
    """Tokens with digits/punctuation are excluded from the trainer;
    uppercase folds in via the shared lowercasing tokenizer ('AB' is a
    third 'ab')."""
    out = _merges(spark, ["ab ab a1b a-b AB"], n_merges=1)
    assert out == [(1, "a", "b", "ab", 3)]


def test_min_word_count(spark):
    """min_word_count=2 drops the hapax 'zq' so (z,q) never pairs."""
    out = _merges(spark, ["ab ab zq"], n_merges=2, min_word_count=2)
    assert out == [(1, "a", "b", "ab", 2)]


def test_layout_independent(spark):
    texts = [f"lower newest lowest wider new{'s' * (i % 3)}" for i in range(20)]
    df = spark.createDataFrame(list(enumerate(texts)), SCHEMA)
    a = [tuple(r) for r in bpe_merges(df, n_merges=4).orderBy("rank").collect()]
    b = [tuple(r) for r in bpe_merges(df.repartition(7, "doc_id"),
                                      n_merges=4).orderBy("rank").collect()]
    assert a == b and len(a) == 4


def test_param_validation(spark):
    df = spark.createDataFrame([(0, "ab")], SCHEMA)
    with pytest.raises(ValueError):
        bpe_merges(df, n_merges=0)
