"""Deduplication operators for web-scale training-data pipelines.

* exact_dedup        — hash-groupBy on a content fingerprint (native).
* ngram_jaccard      — shingle self-join Jaccard near-dup pairs (native,
                       fully relational: shuffle on the shingle key only).
* minhash_lsh        — MinHash signatures + banded LSH bucket join
                       (Arrow pandas UDF for the signature, relational join
                       for the banding; candidate pairs verified by true
                       Jaccard).
* simhash            — 64-bit SimHash + hamming-ball bucketing.

Hashing is md5-derived everywhere so results are engine-portable and
deterministic across cluster sizes. Exact/jaccard have DuckDB oracle twins
in __spark_entry__; minhash/simhash are verified by the true-Jaccard refine
plus kernel tests (signature math is not reasonably SQL-expressible).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .text import fp6, with_fingerprint

# 64 fixed odd multipliers/offsets for the MinHash permutation family
# h_i(x) = (a_i * x + b_i) mod 2^61-1 — generated from a fixed seed.
_MERSENNE = (1 << 61) - 1
_RNG = np.random.default_rng(20240101)
_MINHASH_A = _RNG.integers(1, _MERSENNE, 128, dtype=np.int64) | 1
_MINHASH_B = _RNG.integers(0, _MERSENNE, 128, dtype=np.int64)


def exact_dedup(df: DataFrame, id_col: str = "doc_id",
                text: str = "text") -> DataFrame:
    """Keep the lowest-id representative per identical (normalized) text."""
    w = Window.partitionBy("fingerprint").orderBy(F.col(id_col).asc())
    return (with_fingerprint(df, text)
            .withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .drop("rn"))


def duplicate_groups(df: DataFrame, id_col: str = "doc_id",
                     text: str = "text") -> DataFrame:
    """(fingerprint, n_dups, keep_id) for groups with more than one member."""
    return (with_fingerprint(df, text)
            .groupBy("fingerprint")
            .agg(F.count(F.lit(1)).alias("n_dups"),
                 F.min(id_col).alias("keep_id"))
            .filter(F.col("n_dups") > 1))


def _shingles(text_col, n: int = 3):
    """Distinct word n-gram shingles as an array column (native exprs)."""
    toks = F.split(F.trim(F.lower(text_col)), r"\s+")
    shingles = F.array_distinct(
        F.transform(
            F.sequence(F.lit(1), F.size(toks) - F.lit(n - 1)),
            lambda i: F.concat_ws(" ", F.slice(toks, i, n)),
        ))
    # docs shorter than n tokens contribute no shingles (matches the
    # DuckDB twin where range(1, 0+1) is empty)
    return F.when(F.size(toks) >= n, shingles) \
        .otherwise(F.array().cast("array<string>"))


def ngram_jaccard_pairs(df: DataFrame, id_col: str = "doc_id",
                        text: str = "text", n: int = 3,
                        threshold: float = 0.5) -> DataFrame:
    """Near-duplicate pairs by word-n-gram Jaccard similarity.

    Fully relational: explode distinct shingles, self-join on the shingle
    (shuffle keyed by shingle — the scalable formulation), count
    intersections, Jaccard = inter / (na + nb - inter).
    """
    sh = (df.select(F.col(id_col).alias("id"),
                    F.explode(_shingles(F.col(text), n)).alias("shingle"))
          .distinct())
    sizes = sh.groupBy("id").agg(F.count(F.lit(1)).alias("n_sh"))
    a = sh.alias("a")
    b = sh.alias("b")
    inter = (a.join(b, on="shingle")
             .filter(F.col("a.id") < F.col("b.id"))
             .groupBy(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
             .agg(F.count(F.lit(1)).alias("inter")))
    out = (inter
           .join(sizes.withColumnsRenamed({"id": "id_a", "n_sh": "n_a"}), on="id_a")
           .join(sizes.withColumnsRenamed({"id": "id_b", "n_sh": "n_b"}), on="id_b")
           .withColumn("jaccard", fp6(
               (F.col("inter") / (F.col("n_a") + F.col("n_b") - F.col("inter")))
               .cast("double")))
           .filter(F.col("jaccard") >= threshold)
           .select("id_a", "id_b", "inter", "n_a", "n_b", "jaccard"))
    return out


def ngram_jaccard_sql(inner: str = "documents", id_col: str = "doc_id",
                      text: str = "text", n: int = 3,
                      threshold: float = 0.5) -> str:
    """DuckDB oracle twin of ngram_jaccard_pairs."""
    toks = f"string_split_regex(trim(lower({text})), '\\s+')"
    shingle = (f"list_distinct(list_transform("
               f"range(1, greatest(len({toks}) - {n - 1}, 0) + 1), "
               f"i -> array_to_string(list_slice({toks}, i, i + {n - 1}), ' ')))")
    return f"""
WITH sh AS (
  SELECT DISTINCT {id_col} AS id, unnest({shingle}) AS shingle FROM {inner}
), sizes AS (
  SELECT id, count(*) AS n_sh FROM sh GROUP BY id
), inter AS (
  SELECT a.id AS id_a, b.id AS id_b, count(*) AS inter
  FROM sh a JOIN sh b USING (shingle) WHERE a.id < b.id
  GROUP BY a.id, b.id
)
SELECT id_a, id_b, inter, sa.n_sh AS n_a, sb.n_sh AS n_b,
       floor(CAST(inter AS DOUBLE) / (sa.n_sh + sb.n_sh - inter)
             * 1000000.0 + 0.5) / 1000000.0 AS jaccard
FROM inter JOIN sizes sa ON sa.id = id_a JOIN sizes sb ON sb.id = id_b
WHERE floor(CAST(inter AS DOUBLE) / (sa.n_sh + sb.n_sh - inter)
            * 1000000.0 + 0.5) / 1000000.0 >= {threshold}
"""


def _shingle_hash(arr: np.ndarray) -> np.ndarray:
    """Stable 61-bit integer hash of shingle strings (FNV-1a, vectorized
    enough: one pass per batch of strings)."""
    out = np.empty(len(arr), dtype=np.uint64)
    for i, s in enumerate(arr):
        h = np.uint64(14695981039346656037)
        for byt in s.encode("utf-8"):
            h = np.uint64((int(h) ^ byt) * 1099511628211 & 0xFFFFFFFFFFFFFFFF)
        out[i] = h
    return (out % np.uint64(_MERSENNE)).astype(np.int64)


def minhash_signatures(df: DataFrame, id_col: str = "doc_id",
                       text: str = "text", n: int = 3,
                       num_hashes: int = 64) -> DataFrame:
    """(id, sig array<long>) MinHash signatures via Arrow pandas UDF —
    batch-vectorized over the (shingle x permutation) matrix."""
    a = _MINHASH_A[:num_hashes]
    b = _MINHASH_B[:num_hashes]

    @F.pandas_udf("array<long>")
    def _sig(texts: pd.Series) -> pd.Series:
        out = []
        for t in texts:
            toks = str(t).lower().split()
            shingles = list({" ".join(toks[i:i + n])
                             for i in range(max(len(toks) - n + 1, 0))})
            if not shingles:
                out.append([int(_MERSENNE)] * len(a))
                continue
            hs = _shingle_hash(np.asarray(shingles, dtype=object)).astype(object)
            # (S, H) permuted values mod mersenne prime (python ints: no overflow)
            mins = [min((int(h) * int(ai) + int(bi)) % _MERSENNE for h in hs)
                    for ai, bi in zip(a, b)]
            out.append(mins)
        return pd.Series(out)

    return df.select(F.col(id_col).alias("id"), _sig(F.col(text)).alias("sig"))


def minhash_lsh_pairs(df: DataFrame, id_col: str = "doc_id",
                      text: str = "text", n: int = 3, num_hashes: int = 64,
                      bands: int = 16, threshold: float = 0.5) -> DataFrame:
    """Banded-LSH candidate generation + exact Jaccard verification.

    sig -> ``bands`` band-hashes -> explode -> self-join on (band, hash)
    -> distinct candidate pairs -> verify with true n-gram Jaccard.
    """
    rows_per_band = num_hashes // bands
    sigs = minhash_signatures(df, id_col, text, n, num_hashes)
    banded = sigs.select(
        "id",
        F.posexplode(F.expr(
            f"transform(sequence(0, {bands - 1}), "
            f"b -> hash(slice(sig, b * {rows_per_band} + 1, {rows_per_band})))"
        )).alias("band", "band_hash"))
    a = banded.alias("a")
    b = banded.alias("b")
    cand = (a.join(b, on=["band", "band_hash"])
            .filter(F.col("a.id") < F.col("b.id"))
            .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
            .distinct())
    exact = ngram_jaccard_pairs(df, id_col, text, n, threshold=0.0) \
        .select("id_a", "id_b", "jaccard")
    return (cand.join(exact, on=["id_a", "id_b"], how="inner")
            .filter(F.col("jaccard") >= threshold))


def simhash_bits(df: DataFrame, id_col: str = "doc_id",
                 text: str = "text") -> DataFrame:
    """64-bit SimHash per document (Arrow pandas UDF, token-hash bit votes)."""

    @F.pandas_udf("long")
    def _sim(texts: pd.Series) -> pd.Series:
        out = np.empty(len(texts), dtype=np.int64)
        for i, t in enumerate(texts):
            toks = str(t).lower().split()
            if not toks:
                out[i] = 0
                continue
            hs = _shingle_hash(np.asarray(toks, dtype=object)).astype(np.uint64)
            bits = ((hs[:, None] >> np.arange(64, dtype=np.uint64)[None, :])
                    & np.uint64(1)).astype(np.int64)
            votes = bits.sum(axis=0) * 2 - len(hs)
            word = np.uint64(0)
            for bpos in np.nonzero(votes > 0)[0]:
                word |= np.uint64(1) << np.uint64(bpos)
            out[i] = np.int64(word.astype(np.int64))
        return pd.Series(out)

    return df.select(F.col(id_col).alias("id"), _sim(F.col(text)).alias("simhash"))


def simhash_near_pairs(df: DataFrame, id_col: str = "doc_id",
                       text: str = "text", max_hamming: int = 8) -> DataFrame:
    """Near-dup pairs by SimHash hamming distance, bucketed by 16-bit
    chunks (a pair within hamming<=3 shares at least one chunk; wider
    distances verified after the 4-chunk block join)."""
    sims = simhash_bits(df, id_col, text)
    chunks = sims.select(
        "id", "simhash",
        F.posexplode(F.expr(
            "transform(sequence(0, 3), c -> (simhash >> (c * 16)) & 65535)"
        )).alias("chunk", "chunk_val"))
    a = chunks.alias("a")
    b = chunks.alias("b")
    cand = (a.join(b, on=["chunk", "chunk_val"])
            .filter(F.col("a.id") < F.col("b.id"))
            .select(F.col("a.id").alias("id_a"), F.col("a.simhash").alias("sim_a"),
                    F.col("b.id").alias("id_b"), F.col("b.simhash").alias("sim_b"))
            .distinct())
    return (cand.withColumn(
        "hamming", F.bit_count(F.col("sim_a").bitwiseXOR(F.col("sim_b"))))
        .filter(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming"))
