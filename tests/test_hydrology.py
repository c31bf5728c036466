"""D8 flow routing + watershed (operators/hydrology.py) vs a scalar
reference walk, on both execution paths (dim-scale pandas gate and
distributed pointer doubling)."""

import numpy as np
import pandas as pd
import pytest

from xutil_spark.kernels.tiles import cell_pack
from xutil_spark.operators.hydrology import D8_DIRS


def _brute(cells: dict, zoom: int):
    """cells: (x, y) -> v.  Returns (x, y) -> (dir|None, sink_cell,
    n_steps) by literal per-cell scan + chain walk."""
    n = 2 ** zoom
    flow = {}
    for (x, y), v in cells.items():
        best = None
        for d, dx, dy, e in D8_DIRS:
            ny = y + dy
            if ny < 0 or ny >= n:
                continue
            nx = (x + dx) % n
            drop = v - cells.get((nx, ny), 0)
            if drop <= 0:
                continue
            key = drop * drop * (1 + e)
            if best is None or key > best[0] or (key == best[0] and d < best[1]):
                best = (key, d, (nx, ny))
        flow[(x, y)] = best
    out = {}
    for xy in cells:
        cur, steps = xy, 0
        while True:
            b = flow.get(cur)
            if b is None:
                if cur in cells:  # flat sink
                    sink = cur
                    break
                sink = cur  # exited the surface
                break
            steps += 1
            nxt = b[2]
            if nxt not in cells:
                sink = nxt
                break
            cur = nxt
        d = flow[xy][1] if flow[xy] is not None else None
        out[xy] = (d, int(cell_pack(sink[0], sink[1], zoom)), steps)
    return out


def _surface_df(spark, cells, zoom):
    pdf = pd.DataFrame({
        "cell": [int(cell_pack(x, y, zoom)) for (x, y) in cells],
        "cnt": list(cells.values()),
    })
    return spark.createDataFrame(pdf)


@pytest.mark.parametrize("small_cells", [100_000, 0])
def test_watershed_matches_brute(spark, small_cells):
    from xutil_spark.operators.hydrology import watershed

    zoom = 6
    n = 2 ** zoom
    rng = np.random.default_rng(77 + small_cells)
    cells = {}
    # clustered blobs (long chains) + scattered noise + wrap/pole edges
    for _ in range(4):
        cx, cy = int(rng.integers(0, n)), int(rng.integers(2, n - 2))
        for dx in range(-4, 5):
            for dy in range(-4, 5):
                x, y = (cx + dx) % n, cy + dy
                if 0 <= y < n and rng.random() < 0.8:
                    cells[(x, y)] = cells.get((x, y), 0) + int(
                        20 - 2 * max(abs(dx), abs(dy)) + rng.integers(0, 3))
    for _ in range(60):
        cells[(int(rng.integers(0, n)), int(rng.integers(0, n)))] = int(
            rng.integers(1, 8))
    cells[(0, 0)] = 5          # pole corner
    cells[(n - 1, 10)] = 7     # antimeridian
    cells[(0, 10)] = 3
    for dx in range(3):        # 3×3 plateau: its center is a flat sink
        for dy in range(3):
            cells[(40 + dx, 40 + dy)] = 500

    want = _brute(cells, zoom)
    got = {r["cell"]: r for r in watershed(
        _surface_df(spark, cells, zoom), zoom,
        small_cells=small_cells).collect()}
    assert len(got) == len(want)
    for (x, y), (d, sink, steps) in want.items():
        r = got[int(cell_pack(x, y, zoom))]
        assert r["dir"] == d, ((x, y), r["dir"], d)
        assert r["sink_cell"] == sink, ((x, y), r["sink_cell"], sink)
        assert r["n_steps"] == steps, ((x, y), r["n_steps"], steps)
    # the shape must exercise real chains and flat sinks
    assert max(s for (_, _, s) in want.values()) >= 3
    assert any(d is None for (d, _, _) in want.values())


def test_flow_tie_breaks_compass_priority(spark):
    """Equal drops on two edge neighbors -> the lower compass index
    wins; an edge drop d and a diagonal drop d cannot tie (2d² vs d²)."""
    from xutil_spark.operators.hydrology import flow_directions

    zoom = 4
    # center (5,5)=9 fully surrounded (absent neighbors would win with
    # drop 9): E (6,5)=4 and S (5,6)=4 tie on drop 5 (key 50) -> E
    # (d=2) beats S (d=4); diagonal SE (6,6)=2 has drop 7, key 49 < 50
    # -- the integer-exact 2·d²-vs-d² comparison must pick the edge
    wall = {(5 + dx, 5 + dy): 9 for dx in (-1, 0, 1) for dy in (-1, 0, 1)}
    cells = {**wall, (5, 5): 9, (6, 5): 4, (5, 6): 4, (6, 6): 2}
    out = {r["cell"]: r for r in flow_directions(
        _surface_df(spark, cells, zoom), zoom).collect()}
    c = out[int(cell_pack(5, 5, zoom))]
    assert c["dir"] == 2 and c["succ"] == int(cell_pack(6, 5, zoom))
    cells2 = {**wall, (5, 5): 9, (6, 5): 4, (6, 6): 2}
    out2 = {r["cell"]: r for r in flow_directions(
        _surface_df(spark, cells2, zoom), zoom).collect()}
    assert out2[int(cell_pack(5, 5, zoom))]["dir"] == 2
