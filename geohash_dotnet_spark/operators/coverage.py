"""Distributed polygon / circle coverage operators.

The distributed twin of kernels/polygon.cover_polygon — mirrors the
reference's parallel scan over latitude rows
(/root/reference/src/PolygonHasher.cs:132-173) with Spark tasks over
latitude-row ranges:

    polygons DF -> driver-side prep (parse, antimeridian split, grid plan)
                -> task fan-out (polygon part x lat-row chunk)
                -> repartition -> mapInPandas kernel -> (polygon_id, cell)

Row-range chunking targets a bounded candidate-cell count per task so a
country-sized precision-7 coverage spreads evenly over the cluster instead
of hot-spotting one task (the skew lever at 100 TB scale).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..kernels import circle as CK
from ..kernels import polygon as PK

# ~100k candidate cells per task: measured knee on a 23.8M-cell
# California p7 covering (533 tasks, 2.0x faster than 250k/task whose 217
# tasks leave cores idle in the last wave; below ~20k/task the per-task
# scheduling + Arrow batch overhead dominates)
TASK_TARGET_CELLS = 100_000


def plan_polygon_tasks(polygons: list[tuple[str, str, int, str]]) -> list[dict]:
    """Driver-side prep: (polygon_id, wkt, precision, criteria) -> task rows.

    Each task covers one antimeridian part restricted to a latitude-row
    chunk sized to ~TASK_TARGET_CELLS candidate cells.
    """
    tasks = []
    for polygon_id, wkt, precision, criteria in polygons:
        for rings in PK.parse_wkt(wkt):
            if abs(PK.ring_area(rings[0])) == 0.0:
                continue
            for part_idx, part in enumerate(PK.split_antimeridian(rings)):
                lat0, lat1, lng0, lng1 = PK.part_grid_range(part, precision)
                n_cols = max(lng1 - lng0, 1)
                rows_per_task = max(1, TASK_TARGET_CELLS // n_cols)
                # serialize rings as flat coordinate lists
                ser = [r.ravel().tolist() for r in part]
                for row_lo in range(lat0, lat1, rows_per_task):
                    tasks.append({
                        "polygon_id": polygon_id,
                        "part_idx": part_idx,
                        "precision": precision,
                        "criteria": criteria,
                        "row_lo": row_lo,
                        "row_hi": min(row_lo + rows_per_task, lat1),
                        "rings": ser,
                    })
    return tasks


def cover_polygons(spark: SparkSession, polygons: list[tuple[str, str, int, str]],
                   num_partitions: int | None = None) -> DataFrame:
    """Distributed polygon coverage -> DataFrame(polygon_id string, cell string).

    Result is distinct per (polygon_id, cell) — the distributed analogue of
    the reference's locked HashSet union (src/PolygonHasher.cs:169-173).
    """
    tasks = plan_polygon_tasks(polygons)
    if not tasks:
        return spark.createDataFrame([], "polygon_id string, cell string")
    n_part = num_partitions or min(len(tasks), spark.sparkContext.defaultParallelism)
    tasks_df = spark.createDataFrame(pd.DataFrame(tasks)).repartition(n_part)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for row in pdf.itertuples(index=False):
                rings = [np.asarray(r, dtype=np.float64).reshape(-1, 2)
                         for r in row.rings]
                cells = PK.cover_part(rings, int(row.precision), row.criteria,
                                      lat_range=(int(row.row_lo), int(row.row_hi)))
                if len(cells):
                    yield pd.DataFrame({"polygon_id": row.polygon_id,
                                        "cell": cells})

    out = tasks_df.mapInPandas(run, "polygon_id string, cell string")
    # duplicate cells can appear across antimeridian parts
    return out.distinct()


def cover_circles(spark: SparkSession, circles_df: DataFrame,
                  default_criteria: str = "intersects") -> DataFrame:
    """Distributed circle coverage.

    circles_df columns: circle_id string, lat double, lon double,
    radius_m double, optional precision int (null -> auto), optional
    criteria string. Returns (circle_id, cell).
    """
    cols = circles_df.columns
    if "precision" not in cols:
        circles_df = circles_df.withColumn("precision", F.lit(None).cast("int"))
    if "criteria" not in cols:
        circles_df = circles_df.withColumn("criteria", F.lit(default_criteria))

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for row in pdf.itertuples(index=False):
                p = None if pd.isna(row.precision) else int(row.precision)
                cells = CK.cover_circle(float(row.lat), float(row.lon),
                                        float(row.radius_m), p,
                                        row.criteria or default_criteria)
                if len(cells):
                    yield pd.DataFrame({"circle_id": row.circle_id, "cell": cells})

    return circles_df.mapInPandas(run, "circle_id string, cell string").distinct()
