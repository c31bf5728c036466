"""Slippy-map (Web-Mercator) tile math + packed hierarchical cell ids.

``wgs2tile`` / ``tile2wgs`` / ``tile_image`` are numpy transcriptions of
gis.go:262-283 (same floor semantics, same (lat, lng) return-order quirk
of ``Tile2Wgs``).  On top of them we define the engine's **cell id**: a
single int64 packing ``(z << 58) | (x << 29) | y`` — the H3/S2-style
hierarchical index the north rule asks for.  The quadtree property holds
by construction: the parent of cell (z, x, y) is (z-1, x>>1, y>>1), a
pure bit operation, so coarse-zoom partition pruning and rollups are
integer arithmetic — no geometry is touched after encode.

Zoom ≤ 28 keeps x, y < 2^29 so the packing is collision-free and
non-negative in an int64 (5 zoom bits at 58..62, sign bit unused).
"""

from __future__ import annotations

import numpy as np

_Z_SHIFT = 58
_X_SHIFT = 29
_XY_MASK = (1 << 29) - 1
MAX_ZOOM = 28


def wgs2tile(lng, lat, z):
    """lon/lat° → slippy tile (x, y) at zoom z — gis.go:262-267."""
    lng = np.asarray(lng, dtype=np.float64)
    lat = np.asarray(lat, dtype=np.float64)
    n = np.exp2(np.float64(z))
    x = np.floor((lng + 180.0) / 360.0 * n).astype(np.int64)
    lat_rad = lat * np.pi / 180.0
    y = np.floor(
        (1.0 - np.log(np.tan(lat_rad) + 1.0 / np.cos(lat_rad)) / np.pi) / 2.0 * n
    ).astype(np.int64)
    return x, y


def tile2wgs(x, y, z):
    """Tile (x, y, z) → (lat, lng) of the NW corner — gis.go:269-275.

    Returns (lat, lng) — the reference's quirky order, preserved.
    """
    x = np.asarray(x, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    n = np.pi - 2.0 * np.pi * y / np.exp2(np.float64(z))
    lat = 180.0 / np.pi * np.arctan(0.5 * (np.exp(n) - np.exp(-n)))
    lng = x / np.exp2(np.float64(z)) * 360.0 - 180.0
    return lat, lng


def tile_image(lng, lat, z, deg):
    """lon/lat° → (tile x, y, pixel px, py) with ``deg`` pixels/tile —
    gis.go:277-283: the pixel is the remainder of the tile coordinate at
    zoom ``z + log2(deg)``.  This is the raster↔vector bridge: it places
    every point into a tile AND a pixel of that tile's raster.
    """
    x, y = wgs2tile(lng, lat, z)
    zoom4 = z + int(np.log(float(deg)) / np.log(2.0))
    x4, y4 = wgs2tile(lng, lat, zoom4)
    return x, y, x4 - x * deg, y4 - y * deg


def cell_encode(lng, lat, z):
    """lon/lat° → packed int64 cell id at zoom z."""
    if z > MAX_ZOOM:
        raise ValueError(f"zoom {z} > MAX_ZOOM {MAX_ZOOM}")
    x, y = wgs2tile(lng, lat, z)
    return (np.int64(z) << _Z_SHIFT) | (x << _X_SHIFT) | y


def cell_pack(x, y, z):
    """Pack tile coords → cell id (no geometry)."""
    x = np.asarray(x, dtype=np.int64)
    y = np.asarray(y, dtype=np.int64)
    return (np.int64(z) << _Z_SHIFT) | (x << _X_SHIFT) | y


def cell_decode(cell):
    """cell id → (x, y, z)."""
    cell = np.asarray(cell, dtype=np.int64)
    z = cell >> _Z_SHIFT
    x = (cell >> _X_SHIFT) & _XY_MASK
    y = cell & _XY_MASK
    return x, y, z


def cell_zoom(cell):
    cell = np.asarray(cell, dtype=np.int64)
    return cell >> _Z_SHIFT


def cell_parent(cell, parent_z):
    """Ancestor cell at zoom ``parent_z`` — pure bit arithmetic (quadtree)."""
    x, y, z = cell_decode(cell)
    dz = z - np.int64(parent_z)
    if np.any(dz < 0):
        raise ValueError("parent_z must be <= cell zoom")
    return (np.int64(parent_z) << _Z_SHIFT) | ((x >> dz) << _X_SHIFT) | (y >> dz)


def cell_neighbors(cell, ring: int = 1):
    """(2r+1)² neighbor cells (incl. self) of each cell, x wrapped mod 2^z,
    y clamped to the valid range.  Returns an array of shape
    ``(n, (2r+1)**2)`` — used by the kNN grid join's ring expansion.
    """
    x, y, z = cell_decode(np.atleast_1d(cell))
    n = np.int64(1) << z  # tiles per axis at this zoom
    offs = np.arange(-ring, ring + 1, dtype=np.int64)
    dx, dy = np.meshgrid(offs, offs, indexing="ij")
    dx = dx.ravel()[None, :]
    dy = dy.ravel()[None, :]
    nx = (x[:, None] + dx) % n[:, None]
    ny = np.clip(y[:, None] + dy, 0, n[:, None] - 1)
    cells = (z[:, None] << _Z_SHIFT) | (nx << _X_SHIFT) | ny
    # y-clamping can duplicate cells at the poles; callers dedup via
    # array_distinct after explode.
    return cells


def cell_bounds(cell):
    """cell id → (west, south, east, north) in degrees."""
    x, y, z = cell_decode(cell)
    lat_n, lng_w = tile2wgs(x, y, z)  # NW corner (reference order: lat, lng)
    lat_s, lng_e = tile2wgs(x + 1, y + 1, z)
    return lng_w, lat_s, lng_e, lat_n


def segment_cells(lng1, lat1, lng2, lat2, z):
    """Exact supercover of one straight lon/lat segment: every tile the
    segment touches at zoom ``z`` (scalar endpoints → int64 cell array).

    The segment is straight in (lon, lat) space.  Tile x is LINEAR in
    lon and tile y is MONOTONE in lat (Mercator), so the segment's
    image in tile space is monotone along both axes — cutting the
    parameter t at every integer x- and y-boundary crossing yields
    exact constant-cell spans, and the cell at each span midpoint
    enumerates the full supercover (no sampling gaps, unlike fixed-step
    sampling which can skip corner-clipped tiles).  Boundary crossings
    in x are solved linearly; in y by inverting the Mercator at each
    integer tile row (lat = atan(sinh(π(1 − 2·k/n)))·180/π).

    Cost O(cells crossed) per segment ≈ length / tile-size — the right
    unit for a dim-scale road table (a 10^8-segment network at z12
    yields ~2-6 cover rows per segment).
    """
    n = np.float64(2.0) ** z
    nmax = (1 << z) - 1

    def _fy(lat):
        lr = np.radians(np.float64(lat))
        return (1.0 - np.log(np.tan(lr) + 1.0 / np.cos(lr)) / np.pi) / 2.0 * n

    x1 = (np.float64(lng1) + 180.0) / 360.0 * n
    x2 = (np.float64(lng2) + 180.0) / 360.0 * n
    ts = [np.float64(0.0), np.float64(1.0)]
    if x2 != x1:
        lo, hi = (x1, x2) if x1 < x2 else (x2, x1)
        ks = np.arange(np.ceil(lo), np.floor(hi) + 1.0)
        ts.extend((ks - x1) / (x2 - x1))
    la1, la2 = np.float64(lat1), np.float64(lat2)
    if la2 != la1:
        y1, y2 = _fy(la1), _fy(la2)
        lo, hi = (y1, y2) if y1 < y2 else (y2, y1)
        ks = np.arange(np.ceil(lo), np.floor(hi) + 1.0)
        lat_k = np.degrees(np.arctan(np.sinh(np.pi * (1.0 - 2.0 * ks / n))))
        ts.extend((lat_k - la1) / (la2 - la1))
    ts = np.clip(np.unique(np.asarray(ts, dtype=np.float64)), 0.0, 1.0)
    mids = (ts[:-1] + ts[1:]) * 0.5 if ts.size > 1 else ts
    x, y = wgs2tile(np.float64(lng1) + mids * (np.float64(lng2) - np.float64(lng1)),
                    la1 + mids * (la2 - la1), z)
    x = np.clip(x, 0, nmax)
    y = np.clip(y, 0, nmax)
    return np.unique(cell_pack(x, y, z))
