"""S2 cell-id encoding (public s2geometry scheme), numpy-vectorized.

The north rule calls for "batched H3/S2 cell encoding of image capture
locations"; this module provides the S2 side: lat/lng -> unit sphere ->
cube face -> quadratic (u,v)->(s,t) projection -> level-30 (i,j) ->
Hilbert-curve position, packed into the standard 64-bit cell id layout
(3 face bits, 2*level position bits, trailing lsb marker).  Everything
here derives from the published algorithm in google/s2geometry
(`s2coords.h` / `s2cell_id.cc`); no code is taken from any library —
the lookup tables are regenerated from the 4-subcell Hilbert ordering.

Two implementations are deliberately kept:

- ``cell_id_np``: the engine path — vectorized numpy, 8 table-lookup
  rounds per batch, no per-row Python.  Used by the Spark operator
  (`operators/s2cells.py`) inside a pandas UDF.
- ``cell_id_py``: a scalar big-int reimplementation used only by tests
  and computed-VALUES oracles, so the vectorized path is cross-checked
  against an independently coded walk of the same public spec.

Reference parity note: the reference repo (xvill/xutil) has no S2
support — its cells are slippy-map tiles (gis.go:238-283, covered by
`kernels/tiles.py`); S2 is an engine addition for the 10^12-image
tier where a space-filling-curve cell id gives prefix-partitionable,
skew-salted spatial keys.
"""

from __future__ import annotations

import math

import numpy as np

_LOOKUP_BITS = 4
_SWAP, _INVERT = 1, 2
_MAX_LEVEL = 30
# Hilbert sub-cell orderings (public constants): traversal order of the
# 4 children for each of the 4 orientations, and the orientation delta
# each child applies.
_POS_TO_IJ = ((0, 1, 3, 2), (0, 2, 3, 1), (3, 2, 0, 1), (3, 1, 0, 2))
_POS_TO_ORIENT = (_SWAP, 0, 0, _INVERT | _SWAP)

_lookup_pos = np.zeros(1 << (2 * _LOOKUP_BITS + 2), dtype=np.uint64)
_lookup_ij = np.zeros(1 << (2 * _LOOKUP_BITS + 2), dtype=np.uint64)


def _init_lookup(level: int, i: int, j: int, orig: int, pos: int, orient: int) -> None:
    if level == _LOOKUP_BITS:
        ij = (i << _LOOKUP_BITS) + j
        _lookup_pos[(ij << 2) + orig] = (pos << 2) + orient
        _lookup_ij[(pos << 2) + orig] = (ij << 2) + orient
        return
    level += 1
    i <<= 1
    j <<= 1
    pos <<= 2
    r = _POS_TO_IJ[orient]
    for index in range(4):
        ij = r[index]
        _init_lookup(level, i + (ij >> 1), j + (ij & 1), orig,
                     pos + index, orient ^ _POS_TO_ORIENT[index])


for _o in range(4):
    _init_lookup(0, 0, 0, _o, 0, _o)


# ------------------------------------------------------------------ numpy path


def _uv_to_st(u: np.ndarray) -> np.ndarray:
    """Quadratic projection (the s2geometry default S2_QUADRATIC_PROJECTION).
    np.where evaluates both branches, so the dead branch can see 1∓3u<0
    near |u|=1 — suppress the discarded-NaN warning."""
    with np.errstate(invalid="ignore"):
        return np.where(u >= 0.0,
                        0.5 * np.sqrt(1.0 + 3.0 * u),
                        1.0 - 0.5 * np.sqrt(1.0 - 3.0 * u))


def _st_to_ij(s: np.ndarray) -> np.ndarray:
    return np.clip((np.floor((1 << _MAX_LEVEL) * s)).astype(np.int64),
                   0, (1 << _MAX_LEVEL) - 1)


def cell_id_np(lon: np.ndarray, lat: np.ndarray, level: int = _MAX_LEVEL) -> np.ndarray:
    """Vectorized S2 cell id (signed int64 bit pattern) at ``level``.

    One pass of trig to the unit sphere, face selection by dominant
    axis, per-face central projection, then 8 rounds of 1024-entry
    Hilbert table lookups over the whole batch.
    """
    if not 0 <= level <= _MAX_LEVEL:
        raise ValueError(f"level must be 0..{_MAX_LEVEL}, got {level}")
    lon = np.asarray(lon, dtype=np.float64)
    lat = np.asarray(lat, dtype=np.float64)
    phi = np.radians(lat)
    theta = np.radians(lon)
    cosphi = np.cos(phi)
    x = cosphi * np.cos(theta)
    y = cosphi * np.sin(theta)
    z = np.sin(phi)

    ax, ay, az = np.abs(x), np.abs(y), np.abs(z)
    axis = np.where(az >= np.maximum(ax, ay), 2, np.where(ay >= ax, 1, 0))
    comp = np.choose(axis, (x, y, z))
    face = np.where(comp >= 0.0, axis, axis + 3).astype(np.int64)

    with np.errstate(divide="ignore", invalid="ignore"):
        u = np.select(
            [face == 0, face == 1, face == 2, face == 3, face == 4],
            [y / x, -x / y, -x / z, z / x, z / y],
            default=-y / z,
        )
        v = np.select(
            [face == 0, face == 1, face == 2, face == 3, face == 4],
            [z / x, z / y, -y / z, y / x, -x / y],
            default=-x / z,
        )

    i = _st_to_ij(_uv_to_st(u)).astype(np.uint64)
    j = _st_to_ij(_uv_to_st(v)).astype(np.uint64)

    n = face.astype(np.uint64) << np.uint64(60)
    bits = (face.astype(np.uint64)) & np.uint64(_SWAP)
    mask = np.uint64((1 << _LOOKUP_BITS) - 1)
    for k in range(7, -1, -1):
        kk = np.uint64(k * _LOOKUP_BITS)
        bits += ((i >> kk) & mask) << np.uint64(_LOOKUP_BITS + 2)
        bits += ((j >> kk) & mask) << np.uint64(2)
        bits = _lookup_pos[bits]
        n |= (bits >> np.uint64(2)) << np.uint64(k * 2 * _LOOKUP_BITS)
        bits &= np.uint64(_SWAP | _INVERT)
    leaf = n * np.uint64(2) + np.uint64(1)
    if level < _MAX_LEVEL:
        lsb = np.uint64(1 << (2 * (_MAX_LEVEL - level)))
        leaf = (leaf & ~(np.uint64(2) * lsb - np.uint64(1))) | lsb
    return leaf.view(np.int64)


def cell_parent_np(cell: np.ndarray, level: int) -> np.ndarray:
    """Parent id at a coarser ``level`` (prefix property of the id)."""
    c = np.asarray(cell, dtype=np.int64).view(np.uint64)
    lsb = np.uint64(1 << (2 * (_MAX_LEVEL - level)))
    return ((c & ~(np.uint64(2) * lsb - np.uint64(1))) | lsb).view(np.int64)


def cell_level_np(cell: np.ndarray) -> np.ndarray:
    """Level from the trailing-lsb marker."""
    c = np.asarray(cell, dtype=np.int64).view(np.uint64)
    lsb = c & (~c + np.uint64(1))
    tz = np.zeros(c.shape, dtype=np.int64)
    v = lsb.copy()
    for shift in (32, 16, 8, 4, 2, 1):
        big = v >= (np.uint64(1) << np.uint64(shift))
        tz += np.where(big, shift, 0)
        v = np.where(big, v >> np.uint64(shift), v)
    return _MAX_LEVEL - (tz >> 1)


def token_np(cell: np.ndarray) -> np.ndarray:
    """Canonical hex token: 16 hex digits with trailing zeros stripped."""
    c = np.asarray(cell, dtype=np.int64).view(np.uint64)
    out = np.empty(len(c), dtype=object)
    for idx, v in enumerate(c):
        h = format(int(v), "016x").rstrip("0")
        out[idx] = h if h else "X"
    return out


# ----------------------------------------------------------------- scalar path


def cell_id_py(lon: float, lat: float, level: int = _MAX_LEVEL) -> int:
    """Scalar big-int S2 cell id — independent walk of the same public
    spec, for golden oracles and cross-checking the numpy path."""
    phi, theta = math.radians(lat), math.radians(lon)
    p = (math.cos(phi) * math.cos(theta),
         math.cos(phi) * math.sin(theta),
         math.sin(phi))
    axis = max(range(3), key=lambda a: abs(p[a]))
    face = axis if p[axis] >= 0 else axis + 3
    x, y, z = p
    u, v = {
        0: lambda: (y / x, z / x),
        1: lambda: (-x / y, z / y),
        2: lambda: (-x / z, -y / z),
        3: lambda: (z / x, y / x),
        4: lambda: (z / y, -x / y),
        5: lambda: (-y / z, -x / z),
    }[face]()

    def st(w: float) -> float:
        return (0.5 * math.sqrt(1.0 + 3.0 * w) if w >= 0
                else 1.0 - 0.5 * math.sqrt(1.0 - 3.0 * w))

    def ij(s: float) -> int:
        return min(max(int(math.floor((1 << _MAX_LEVEL) * s)), 0),
                   (1 << _MAX_LEVEL) - 1)

    i, j = ij(st(u)), ij(st(v))
    n = face << 60
    bits = face & _SWAP
    for k in range(7, -1, -1):
        m = (1 << _LOOKUP_BITS) - 1
        bits += ((i >> (k * _LOOKUP_BITS)) & m) << (_LOOKUP_BITS + 2)
        bits += ((j >> (k * _LOOKUP_BITS)) & m) << 2
        bits = int(_lookup_pos[bits])
        n |= (bits >> 2) << (k * 2 * _LOOKUP_BITS)
        bits &= _SWAP | _INVERT
    leaf = n * 2 + 1
    if level < _MAX_LEVEL:
        lsb = 1 << (2 * (_MAX_LEVEL - level))
        leaf = (leaf & ~(2 * lsb - 1)) | lsb
    return leaf - (1 << 64) if leaf >= (1 << 63) else leaf


def token_py(cell: int) -> str:
    h = format(cell & ((1 << 64) - 1), "016x").rstrip("0")
    return h if h else "X"
