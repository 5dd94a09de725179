"""Named precision constants — public-API parity with the reference's
``Precision`` class (/root/reference/src/Precision.cs:11-66), which
documents each geohash length by the approximate physical size of its
cells at the equator.

Usage::

    from geohash_dotnet_spark.functions.precision import SIZE_KM_5X5
    with_geohash(pages, "lat", "lon", SIZE_KM_5X5)

The sizes are documentation aliases, not measurements — exact
latitude-dependent dimensions come from
``kernels.distance.cell_size_m(precision, lat)``.
"""

from __future__ import annotations

MIN_PRECISION = 1
MAX_PRECISION = 12

#: ~5,000 km x 5,000 km cells
SIZE_KM_5000X5000 = 1
#: ~1,250 km x 625 km cells
SIZE_KM_1250X625 = 2
#: ~156 km x 156 km cells
SIZE_KM_156X156 = 3
#: ~39 km x 20 km cells
SIZE_KM_39X20 = 4
#: ~5 km x 5 km cells
SIZE_KM_5X5 = 5
#: ~1 km x 1 km cells
SIZE_KM_1X1 = 6
#: ~153 m x 153 m cells
SIZE_M_153X153 = 7
#: ~38 m x 19 m cells
SIZE_M_38X19 = 8
#: ~5 m x 5 m cells
SIZE_M_5X5 = 9
#: ~1 m x 1 m cells
SIZE_M_1X1 = 10
#: ~149 mm x 149 mm cells
SIZE_MM_149X149 = 11
#: ~37 mm x 19 mm cells
SIZE_MM_37X19 = 12

#: (approx_width_m, approx_height_m) per precision level, equator-ish —
#: the documented magnitudes behind the constant names above.
APPROX_CELL_SIZE_M: dict[int, tuple[float, float]] = {
    1: (5_000_000.0, 5_000_000.0),
    2: (1_250_000.0, 625_000.0),
    3: (156_000.0, 156_000.0),
    4: (39_000.0, 20_000.0),
    5: (5_000.0, 5_000.0),
    6: (1_000.0, 1_000.0),
    7: (153.0, 153.0),
    8: (38.0, 19.0),
    9: (5.0, 5.0),
    10: (1.0, 1.0),
    11: (0.149, 0.149),
    12: (0.037, 0.019),
}
