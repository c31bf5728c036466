"""Blob labeling (raster/images.py blob_label / blob_stats)."""

import numpy as np

from xutil_spark.raster.images import blob_label


def test_two_blobs_diagonal_not_connected():
    m = np.zeros((4, 4), dtype=bool)
    m[0, 0] = m[0, 1] = True      # blob A: 2 px
    m[1, 2] = m[2, 2] = m[2, 3] = True  # blob B: 3 px (diag from A)
    blobs = sorted(blob_label(m))
    assert len(blobs) == 2
    assert blobs[0] == (2, 0, 0, 1, 0)          # n, min_y, min_x, Σx, Σy
    assert blobs[1] == (3, 1, 2, 7, 5)


def test_full_and_empty_masks():
    assert blob_label(np.ones((3, 2), dtype=bool)) == [(6, 0, 0, 3, 6)]
    assert blob_label(np.zeros((3, 2), dtype=bool)) == []


def test_u_shape_single_component():
    m = np.array([[1, 0, 1],
                  [1, 0, 1],
                  [1, 1, 1]], dtype=bool)
    blobs = blob_label(m)
    assert len(blobs) == 1 and blobs[0][0] == 7


def test_mass_conservation_on_random_mask():
    # the contract oracle pins BFS vs an independent scanline
    # union-find on real images; here pin mask-mass conservation
    rng = np.random.default_rng(3)
    m = rng.random((20, 30)) > 0.55
    blobs = blob_label(m)
    assert sum(b[0] for b in blobs) == int(m.sum())
    # every blob anchor is an actual set pixel
    for n, my, mx, sx, sy in blobs:
        assert m[my, mx]
