"""Pure numpy/python kernels — no Spark imports allowed in this package.

Every function is vectorized over numpy arrays so the ``functions`` layer
can wrap them in Arrow-batched ``pandas_udf``s with zero per-row Python.
"""

from xutil_spark.kernels.rounding import round_half_away, point_round8
from xutil_spark.kernels.coords import (
    wgs2gcj, gcj2wgs, gcj2bd, bd2gcj, wgs2bd, bd2wgs,
)
from xutil_spark.kernels.distance import (
    azimuth, point_distance, point_dist_haversine, point_mid, point_at,
)
from xutil_spark.kernels.tiles import (
    wgs2tile, tile2wgs, tile_image, cell_encode, cell_decode,
    cell_parent, cell_neighbors, cell_zoom,
)
from xutil_spark.kernels.baidu import bd09_to_mercator, mercator_to_bd09, bd09_to_tile

__all__ = [
    "round_half_away", "point_round8",
    "wgs2gcj", "gcj2wgs", "gcj2bd", "bd2gcj", "wgs2bd", "bd2wgs",
    "azimuth", "point_distance", "point_dist_haversine", "point_mid", "point_at",
    "wgs2tile", "tile2wgs", "tile_image", "cell_encode", "cell_decode",
    "cell_parent", "cell_neighbors", "cell_zoom",
    "bd09_to_mercator", "mercator_to_bd09", "bd09_to_tile",
]
