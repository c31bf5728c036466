"""tile_pyramid: exact pixel parity with a hand-rolled reference."""

import numpy as np
import pandas as pd
import pytest

from xutil_spark.kernels import codec as K_codec
from xutil_spark.kernels.tiles import cell_pack
from xutil_spark.raster.pyramid import downsample2x, tile_pyramid

DEG = 8


def _naive_down(c):
    out = np.zeros((c.shape[0] // 2, c.shape[1] // 2, 3), dtype=np.uint8)
    for i in range(out.shape[0]):
        for j in range(out.shape[1]):
            s = c[2 * i:2 * i + 2, 2 * j:2 * j + 2].astype(int).sum(axis=(0, 1))
            out[i, j] = s // 4
    return out


def test_downsample2x_matches_naive():
    rng = np.random.default_rng(3)
    c = rng.integers(0, 256, (2 * DEG, 2 * DEG, 3), dtype=np.uint8)
    assert np.array_equal(downsample2x(c), _naive_down(c))


def _mosaic_row(x, y, z, color):
    px = np.full((DEG, DEG, 3), color, dtype=np.uint8)
    return {"cell": int(cell_pack(x, y, z)), "zoom": z, "n_images": 1,
            "deg": DEG, "fmt": "raw", "bytes": K_codec.encode_raw(px)}


def test_pyramid_two_levels_exact(spark):
    """Four solid-color children at z5 → one parent at z4 with the four
    colors in the right quadrants; its z3 ancestor mixes with black
    siblings.  Every pixel checked exactly."""
    colors = {(2, 2): 40, (3, 2): 80, (2, 3): 120, (3, 3): 200}
    rows = [_mosaic_row(x, y, 5, c) for (x, y), c in colors.items()]
    rows.append(_mosaic_row(6, 6, 5, 240))  # lone child elsewhere
    df = spark.createDataFrame(pd.DataFrame(rows))

    out = tile_pyramid(df, from_zoom=5, to_zoom=3, deg=DEG,
                       out_fmt="raw").collect()
    by_cell = {(r["zoom"], r["cell"]): r for r in out}
    assert len(out) == 5 + 2 + 2  # passthrough + z4 + z3

    # z4 parent (1,1): solid quadrants (uniform 2x2 blocks → mean = color)
    r = by_cell[(4, int(cell_pack(1, 1, 4)))]
    px = K_codec.decode_raw(bytes(r["bytes"]), DEG, DEG)
    h = DEG // 2
    assert (px[:h, :h] == 40).all()      # child (2,2): x&1=0, y&1=0 → NW
    assert (px[:h, h:] == 80).all()      # child (3,2) → NE
    assert (px[h:, :h] == 120).all()     # child (2,3) → SW
    assert (px[h:, h:] == 200).all()
    assert r["n_images"] == 4

    # z4 parent (3,3) from lone child (6,6): NW quadrant 240, rest black
    r = by_cell[(4, int(cell_pack(3, 3, 4)))]
    px = K_codec.decode_raw(bytes(r["bytes"]), DEG, DEG)
    assert (px[:h, :h] == 240).all() and px[h:, :].sum() == 0 and px[:h, h:].sum() == 0

    # z3 ancestor (0,0): the z4 parent lands in the SE quadrant (1&1=1),
    # each solid z4 quadrant shrinks to a solid quarter-quadrant
    r = by_cell[(3, int(cell_pack(0, 0, 3)))]
    px = K_codec.decode_raw(bytes(r["bytes"]), DEG, DEG)
    q = DEG // 4
    se = px[h:, h:]
    assert (se[:q, :q] == 40).all() and (se[:q, q:] == 80).all()
    assert (se[q:, :q] == 120).all() and (se[q:, q:] == 200).all()
    assert px[:h, :].sum() == 0
    assert r["n_images"] == 4


def test_pyramid_chunked_matches_single_chunk(spark):
    """A byte budget that forces one-level chunks (persist-boundary
    path) must produce byte-identical levels to the single-chunk
    subtree render."""
    rng = np.random.default_rng(11)
    rows = [_mosaic_row(x, y, 6, int(rng.integers(1, 255)))
            for x in range(4, 8) for y in range(2, 5)]
    df = spark.createDataFrame(pd.DataFrame(rows))

    one = tile_pyramid(df, from_zoom=6, to_zoom=3, deg=DEG, out_fmt="raw")
    many = tile_pyramid(df, from_zoom=6, to_zoom=3, deg=DEG, out_fmt="raw",
                        group_byte_budget=DEG * DEG * 3 * 4)  # step == 1
    key = lambda r: (r["zoom"], r["cell"])
    a = {key(r): (r["n_images"], bytes(r["bytes"])) for r in one.collect()}
    b = {key(r): (r["n_images"], bytes(r["bytes"])) for r in many.collect()}
    assert len(a) == len(rows) + 4 + 2 + 1  # z6 + z5 + z4 + z3
    assert a == b


def test_pyramid_rejects_bad_zoom_order(spark):
    df = spark.createDataFrame(pd.DataFrame([_mosaic_row(0, 0, 5, 1)]))
    with pytest.raises(ValueError):
        tile_pyramid(df, from_zoom=5, to_zoom=5)
