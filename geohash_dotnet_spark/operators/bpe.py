"""Distributed BPE tokenizer training (Sennrich et al. 2016): learn the
merge table for a byte-pair-encoding vocabulary from the corpus itself.

Training a tokenizer IS a corpus-scale aggregation problem — the step
every LLM data pipeline runs before token counting, shard packing, or
perplexity filtering means anything. Each round: count adjacent symbol
pairs across the (word, count) vocabulary, pick the most frequent pair,
fuse it everywhere, repeat. The merge table (rank-ordered pair list) is
the trained artifact users ship to their tokenizer.

Scale shape — one corpus pass, then vocabulary-scale rounds:

* The corpus is touched exactly ONCE: the word-count aggregation
  (explode + map-side partial agg). Everything after runs on the
  distinct-word vocabulary, which is Heaps-law bounded (|V| ≈ O(N^0.7)
  — millions of rows when the corpus is trillions of tokens), cached.
* Per merge round: one vocabulary-scale pair-count aggregation (pairs
  per word ≤ word length; map-side partials collapse to the distinct-
  pair support), ONE driver-synced row (the argmax pair — the same
  bounded sync discipline as kmeans' C·dim integers per round), and a
  literal-merge fold projection — the chosen pair is embedded as a
  LITERAL in the rebuild expression (the kmeans/IVF literal-codebook
  lesson), so applying a merge is a zero-join, zero-exchange map.
* The per-round vocab is cached and the previous round released:
  lineage stays O(1) deep in compute terms across any n_merges.

Determinism (the gate): pair counts are exact integers; the argmax
tie-breaks (count desc, lhs asc, rhs asc); the greedy left-to-right
merge application is a string fold whose "last symbol == lhs" test is
`acc = lhs OR endswith(acc, ' ' || lhs)` — exact because symbols never
contain spaces — and whose merge step is simply `acc || rhs` (the
trailing lhs is already in place). A freshly merged symbol can never
false-match the NEXT pair's lhs-check unless it textually equals lhs,
which reproduces exactly the non-overlapping greedy scan reference BPE
uses ("a a a" under (a,a) → "aa a", never "aa aa"). The DuckDB twin
replays the identical fold via list_reduce with the merge row
cross-joined (an independent formulation of the same recursion), so
every merge decision — each of which depends on the full history of
prior applications — is value-checked end to end.

Words are lowercase-alpha runs (``^[a-z]+$`` after the shared
whitespace tokenization) so the Java and RE2 regex engines agree
exactly; production would widen the alphabet, the dataflow is
identical.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .text import _tokens

__all__ = ["bpe_merges", "bpe_merges_sql"]

# space-join every character: "hello" -> "h e l l o"
_SYM_SPARK = "trim(regexp_replace({w}, '(.)', '$1 '))"
_SYM_DUCK = "trim(regexp_replace({w}, '(.)', '\\1 ', 'g'))"

_PAIRS_SPARK = (
    "explode(zip_with(slice(toks, 1, size(toks) - 1), "
    "slice(toks, 2, size(toks) - 1), "
    "(a, b) -> struct(a AS lhs, b AS rhs)))")

# greedy left-to-right merge fold; {l}/{r} are [a-z]+ literals
_FOLD_SPARK = (
    "aggregate(slice(toks, 2, size(toks) - 1), element_at(toks, 1), "
    "(acc, x) -> CASE WHEN x = '{r}' AND (acc = '{l}' "
    "OR endswith(acc, ' {l}')) THEN concat(acc, '{r}') "
    "ELSE concat(acc, ' ', x) END)")


def _word_counts(df: DataFrame, text: str) -> DataFrame:
    return (df.select(F.explode(_tokens(F.col(text))).alias("w"))
            .filter(F.col("w").rlike("^[a-z]+$"))
            .groupBy("w").agg(F.count(F.lit(1)).alias("cnt")))


def bpe_merges(df: DataFrame, text: str = "text", n_merges: int = 10,
               min_word_count: int = 1) -> DataFrame:
    """Learn ``n_merges`` BPE merges from the corpus; returns the merge
    table (rank, lhs, rhs, merged, pair_count) — rank 1 is the first
    (most frequent) merge. ``min_word_count`` optionally drops hapax
    words from the trainer (rare words barely move pair counts but
    dominate |V| at web scale — the standard cut)."""
    if n_merges < 1:
        raise ValueError("n_merges must be >= 1")
    spark = df.sparkSession
    wc = _word_counts(df, text)
    if min_word_count > 1:
        wc = wc.filter(F.col("cnt") >= int(min_word_count))
    vocab = (wc.select(
        F.expr(_SYM_SPARK.format(w="w")).alias("s"), "cnt")
        .persist())

    # one job per round: the pair-count action doubles as the cache
    # materializer for the current vocab, so the PARENT round's cache
    # is released one round late (after its child is safely cached)
    # instead of paying a separate count() job per round.
    merges: list[tuple] = []
    prev = None
    try:
        for rank in range(1, int(n_merges) + 1):
            top = (vocab
                   .select(F.split("s", " ").alias("toks"), "cnt")
                   .select(F.expr(_PAIRS_SPARK).alias("p"), "cnt")
                   .groupBy(F.col("p.lhs").alias("lhs"),
                            F.col("p.rhs").alias("rhs"))
                   .agg(F.sum("cnt").alias("pc"))
                   .orderBy(F.col("pc").desc(), "lhs", "rhs")
                   .limit(1).collect())
            if prev is not None:
                prev.unpersist()
            prev = None
            if not top:
                break  # vocabulary fully merged — nothing left to pair
            l, r, pc = top[0]["lhs"], top[0]["rhs"], int(top[0]["pc"])
            merges.append((rank, l, r, l + r, pc))
            nxt = (vocab.select(F.split("s", " ").alias("toks"), "cnt")
                   .select(F.expr(_FOLD_SPARK.format(l=l, r=r)).alias("s"),
                           "cnt")
                   .persist())
            prev, vocab = vocab, nxt
    finally:
        if prev is not None:
            prev.unpersist()
        vocab.unpersist()
    return spark.createDataFrame(
        merges, "rank long, lhs string, rhs string, merged string, "
                "pair_count long")


def bpe_merges_sql(inner: str = "documents", text: str = "text",
                   n_merges: int = 10, min_word_count: int = 1) -> str:
    """DuckDB oracle twin of :func:`bpe_merges`: ``n_merges`` chained
    CTE blocks — pair counts via unnest+group, the argmax via
    ORDER/LIMIT 1, the merge application via list_reduce with the
    1-row merge CTE cross-joined (independent of Spark's
    literal-embedded aggregate fold)."""
    toks = f"string_split_regex(trim(lower({text})), '\\s+')"
    having = (f"HAVING count(*) >= {int(min_word_count)}"
              if min_word_count > 1 else "")
    sym = _SYM_DUCK.format(w="w")
    blocks = [f"""
w0 AS (
  SELECT w, CAST(count(*) AS BIGINT) AS cnt FROM (
    SELECT unnest({toks}) AS w FROM {inner}
  ) WHERE regexp_matches(w, '^[a-z]+$') GROUP BY w {having}
), v0 AS MATERIALIZED (
  SELECT {sym} AS s, cnt FROM w0
)"""]
    selects = []
    for k in range(1, int(n_merges) + 1):
        fold = (f"list_reduce(string_split(s, ' '), (acc, x) -> "
                f"CASE WHEN x = m.rhs AND (acc = m.lhs "
                f"OR ends_with(acc, ' ' || m.lhs)) THEN acc || m.rhs "
                f"ELSE acc || ' ' || x END)")
        blocks.append(f"""
p{k} AS (
  SELECT lhs, rhs, CAST(sum(cnt) AS BIGINT) AS pc FROM (
    SELECT toks[i] AS lhs, toks[i + 1] AS rhs, cnt FROM (
      SELECT unnest(range(1, len(toks))) AS i, toks, cnt FROM (
        SELECT string_split(s, ' ') AS toks, cnt FROM v{k - 1}
      )
    )
  ) GROUP BY lhs, rhs
), m{k} AS (
  SELECT lhs, rhs, pc FROM p{k} ORDER BY pc DESC, lhs, rhs LIMIT 1
), v{k} AS MATERIALIZED (
  -- MATERIALIZED: v{k} is read twice (p{k+1} and v{k+1}); inlining
  -- would re-run the whole merge chain per reference (2^n blowup)
  SELECT {fold} AS s, v.cnt FROM v{k - 1} v, m{k} m
)""")
        selects.append(
            f"SELECT CAST({k} AS BIGINT) AS rank, lhs, rhs, "
            f"lhs || rhs AS merged, pc AS pair_count FROM m{k}")
    return ("WITH " + ",".join(blocks) + "\n"
            + "\nUNION ALL\n".join(selects))
