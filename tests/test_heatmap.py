"""kde_smooth: exact integer convolution on hand-built grids."""

import pandas as pd
import pytest

from xutil_spark.kernels.tiles import cell_pack
from xutil_spark.operators.heatmap import gaussian_kernel_int, kde_smooth


def test_kernel_weights_symmetric_and_peaked():
    k = {(dx, dy): w for dx, dy, w in gaussian_kernel_int(2, 1.0)}
    assert k[(0, 0)] == 1024
    for (dx, dy), w in k.items():
        assert k[(-dx, -dy)] == w == k[(dy, dx)]
        assert w <= k[(0, 0)]


def test_single_source_spreads_kernel(spark):
    z = 6
    src = spark.createDataFrame(pd.DataFrame(
        {"cell": [int(cell_pack(10, 20, z))], "cnt": [3]}))
    out = {r["cell"]: r["density"]
           for r in kde_smooth(src, z, radius=2, sigma=1.0).collect()}
    kern = gaussian_kernel_int(2, 1.0)
    assert len(out) == len(kern)
    for dx, dy, w in kern:
        assert out[int(cell_pack(10 + dx, 20 + dy, z))] == 3 * w


def test_edge_rows_drop_and_x_wraps(spark):
    """y beyond the grid is dropped (no tiles past the poles); x wraps
    mod 2^z (antimeridian)."""
    z = 4  # 16x16 grid
    src = spark.createDataFrame(pd.DataFrame(
        {"cell": [int(cell_pack(0, 0, z))], "cnt": [1]}))
    rows = kde_smooth(src, z, radius=1, sigma=1.0).collect()
    # 3x3 kernel: dy=-1 row dropped -> 6 cells survive
    assert len(rows) == 6
    cells = {r["cell"] for r in rows}
    assert int(cell_pack(15, 0, z)) in cells  # dx=-1 wrapped to x=15
    assert int(cell_pack(15, 1, z)) in cells


def test_two_sources_sum_in_overlap(spark):
    z = 6
    src = spark.createDataFrame(pd.DataFrame(
        {"cell": [int(cell_pack(10, 20, z)), int(cell_pack(11, 20, z))],
         "cnt": [1, 5]}))
    out = {r["cell"]: r["density"]
           for r in kde_smooth(src, z, radius=1, sigma=1.0).collect()}
    k = {(dx, dy): w for dx, dy, w in gaussian_kernel_int(1, 1.0)}
    # cell between the two sources: (10,20) contributes k[0,0], (11,20) k[-1,0]
    assert out[int(cell_pack(10, 20, z))] == 1 * k[(0, 0)] + 5 * k[(-1, 0)]
    assert out[int(cell_pack(11, 20, z))] == 1 * k[(1, 0)] + 5 * k[(0, 0)]
