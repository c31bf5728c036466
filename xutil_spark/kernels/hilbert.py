"""Hilbert space-filling-curve index over the slippy tile grid.

The engine already orders spatial data by three keys — packed Morton-
style cells (kernels/tiles.py), geohash (functions/geohash.py) and S2
(kernels/s2.py).  The Hilbert d-index is the fourth and the one with
the strongest locality guarantee: unlike Morton/geohash it has NO
"seam jumps" (consecutive d values are always 4/8-neighbors), so a
range scan over d touches a compact spatial blob — the property S2
itself borrows (S2 is Hilbert-on-cube-faces) and the right sort key
for range-partitioned file layout (plans/layout.py) when scan windows
are spatial.

Algorithm: the classic iterative rotate-and-reflect walk (Hilbert
1891; the compact xy↔d formulation popularized by the public-domain
Wikipedia reference implementation), vectorized over numpy int64
arrays — z iterations of pure bit arithmetic, no Python loop over
rows.  ``xy2d_sql`` emits the identical computation as one chained
CTE per bit level so the DuckDB oracle replays the exact integer walk.
"""

from __future__ import annotations

import numpy as np


def xy2d(x, y, z: int):
    """Tile (x, y) at zoom ``z`` → Hilbert curve position d in
    [0, 4^z), vectorized int64."""
    x = np.asarray(x, dtype=np.int64).copy()
    y = np.asarray(y, dtype=np.int64).copy()
    d = np.zeros_like(x)
    s = np.int64(1) << (z - 1)
    while s > 0:
        rx = ((x & s) > 0).astype(np.int64)
        ry = ((y & s) > 0).astype(np.int64)
        d += s * s * ((3 * rx) ^ ry)
        # rotate the quadrant so the sub-curve orientation is canonical
        swap = ry == 0
        flip = swap & (rx == 1)
        x2 = np.where(flip, s - 1 - x, x)
        y2 = np.where(flip, s - 1 - y, y)
        x, y = np.where(swap, y2, x2), np.where(swap, x2, y2)
        s >>= 1
    return d


def d2xy(d, z: int):
    """Hilbert position d → tile (x, y) at zoom ``z`` — the exact
    inverse of :func:`xy2d` (pytest pins the bijection)."""
    d = np.asarray(d, dtype=np.int64)
    t = d.copy()
    x = np.zeros_like(d)
    y = np.zeros_like(d)
    s = np.int64(1)
    n = np.int64(1) << z
    while s < n:
        rx = (t // 2) & 1
        ry = (t ^ rx) & 1
        # un-rotate
        flip = (ry == 0) & (rx == 1)
        x2 = np.where(flip, s - 1 - x, x)
        y2 = np.where(flip, s - 1 - y, y)
        swap = ry == 0
        x, y = np.where(swap, y2, x2), np.where(swap, x2, y2)
        x += s * rx
        y += s * ry
        t //= 4
        s <<= 1
    return x, y


def xy2d_sql(x_expr: str, y_expr: str, z: int,
             src: str, out: str = "hd") -> tuple[str, str]:
    """Chained-CTE ANSI SQL replaying :func:`xy2d` bit-for-bit: one CTE
    per bit level carrying the (x, y, d) state.  ``src`` is the name of
    an existing CTE/table providing ``x_expr``/``y_expr`` plus any
    carry-through columns (they ride along via ``SELECT *``).  Returns
    ``(cte_block, final_cte_name)`` — embed as
    ``WITH {cte_block} SELECT …, {out} FROM {final_cte_name}``."""
    stages = [
        f"h0 AS (SELECT *, CAST({x_expr} AS BIGINT) AS _hx,"
        f" CAST({y_expr} AS BIGINT) AS _hy, CAST(0 AS BIGINT) AS {out}"
        f" FROM {src})"
    ]
    lvl = 0
    s = 1 << (z - 1)
    while s > 0:
        p, c = f"h{lvl}", f"h{lvl + 1}"
        stages.append(
            f"{c} AS (SELECT * EXCLUDE (_hx, _hy, {out}),\n"
            f"  CASE WHEN (_hy & {s}) = 0 THEN\n"
            f"    CASE WHEN (_hx & {s}) > 0 THEN {s} - 1 - _hy ELSE _hy END\n"
            f"  ELSE _hx END AS _hx,\n"
            f"  CASE WHEN (_hy & {s}) = 0 THEN\n"
            f"    CASE WHEN (_hx & {s}) > 0 THEN {s} - 1 - _hx ELSE _hx END\n"
            f"  ELSE _hy END AS _hy,\n"
            f"  {out} + {s}::BIGINT * {s}::BIGINT *\n"
            f"    xor(3 * CASE WHEN (_hx & {s}) > 0 THEN 1 ELSE 0 END,\n"
            f"        CASE WHEN (_hy & {s}) > 0 THEN 1 ELSE 0 END) AS {out}\n"
            f"  FROM {p})"
        )
        lvl += 1
        s >>= 1
    return ",\n".join(stages), f"h{lvl}"
