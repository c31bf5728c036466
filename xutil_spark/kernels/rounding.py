"""Half-away-from-zero rounding matching the reference's gonum floats.Round.

The reference rounds every coordinate-transform output to 8 decimals via
``PointRound8`` (gis.go:13-30, applied at gis.go:99-144).  gonum's
``floats.Round`` rounds half away from zero, which differs from numpy's
default banker's rounding (``np.round``) on exact .5 ties — so we implement
it explicitly: ``sign(x) * floor(|x * 10^p| + 0.5) / 10^p``.
"""

from __future__ import annotations

import numpy as np


def round_half_away(x, prec: int):
    """Round half away from zero to ``prec`` decimals (gis.go:13-15)."""
    x = np.asarray(x, dtype=np.float64)
    p = 10.0 ** prec
    return np.copysign(np.floor(np.abs(x) * p + 0.5), x) / p


def point_round6(lon, lat):
    """gis.go:18-20."""
    return round_half_away(lon, 6), round_half_away(lat, 6)


def point_round7(lon, lat):
    """gis.go:22-25."""
    return round_half_away(lon, 7), round_half_away(lat, 7)


def point_round8(lon, lat):
    """gis.go:27-30."""
    return round_half_away(lon, 8), round_half_away(lat, 8)
