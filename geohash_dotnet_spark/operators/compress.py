"""Distributed covering-set compression (DataFrame algebra twin of
kernels/compress.py; semantics of src/GeohashCompressor.cs:19-99).

Stages (all native DataFrame ops, no UDF):
1. truncate to max_level (substring) + distinct;
2. ancestor prune: explode each cell's proper prefixes, left-semi join
   against the cell set, anti-join the covered descendants away;
3. bottom-up 32-sibling merge: per level (longest first, <= 11 rounds),
   parents with exactly 32 children absorb them — groupBy(parent) count,
   cascade by unioning merged parents into the next level up.

The per-level loop is bounded (max 11 rounds) and each round is a
partial+final hash aggregation keyed by the parent prefix — scales to
billion-cell coverings since a merge only ever co-locates one parent's
32 children (never a whole covering on one node).
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MAX_PRECISION = 12


def compress_cells(cells_df: DataFrame, min_level: int = 1,
                   max_level: int = 12, cell_col: str = "cell",
                   group_cols: list[str] | None = None) -> DataFrame:
    """Compress a cell set (optionally per group) to the minimal covering.

    Returns a DataFrame with the group columns + ``cell``.
    """
    if not (1 <= min_level <= MAX_PRECISION):
        raise ValueError("min_level out of range")
    if not (min_level <= max_level <= MAX_PRECISION):
        raise ValueError("max_level out of range")
    g = group_cols or []

    # 1. truncate + dedupe
    cells = (cells_df
             .select(*g, F.substring(F.col(cell_col), 1, max_level).alias("cell"))
             .filter(F.length("cell") >= 1)
             .distinct())

    # 2. ancestor prune: drop any cell having a proper prefix in the set
    prefixes = cells.select(
        *g, "cell",
        F.explode(F.expr(
            "transform(sequence(1, length(cell) - 1), i -> substring(cell, 1, i))"
        )).alias("pfx"))
    ancestors = cells.select(*g, F.col("cell").alias("pfx"))
    covered = (prefixes.join(ancestors, on=[*g, "pfx"], how="left_semi")
               .select(*g, "cell").distinct())
    pruned = (cells.join(covered, on=[*g, "cell"], how="left_anti")
              .withColumn("len", F.length("cell")))
    pruned = pruned.cache()

    # 3. level-wise 32-sibling cascade (longest level first)
    max_depth = pruned.agg(F.max("len")).collect()[0][0] or 0
    done: list[DataFrame] = []
    current = pruned
    for length in range(int(max_depth), min_level, -1):
        level = (current.filter(F.col("len") == length)
                 .withColumn("parent", F.substring("cell", 1, length - 1)))
        parents = (level.groupBy(*g, "parent")
                   .agg(F.count(F.lit(1)).alias("n"))
                   .filter(F.col("n") == 32)
                   .select(*g, "parent"))
        kept = (level.join(parents, on=[*g, "parent"], how="left_anti")
                .select(*g, "cell", "len"))
        done.append(kept.select(*g, "cell"))
        merged = (parents.select(*g, F.col("parent").alias("cell"))
                  .withColumn("len", F.lit(length - 1)))
        current = (current.filter(F.col("len") != length)
                   .unionByName(merged))
    done.append(current.select(*g, "cell"))
    return reduce(lambda a, b: a.unionByName(b), done)
