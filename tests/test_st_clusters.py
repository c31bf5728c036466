"""st_grid_clusters (spatiotemporal voxel clustering) vs a scalar
union-find reference."""

import numpy as np
import pandas as pd

from xutil_spark.kernels.tiles import cell_pack


def _brute(voxels: dict, zoom: int):
    """voxels: (x, y, bkt) -> count (already dense-filtered).  Returns
    (x, y, bkt) -> min voxel id of its 26-connected component."""
    n = 1 << zoom

    def vid(x, y, b):
        return (x * n + y) * (1 << 20) + b

    parent = {v: v for v in voxels}

    def find(u):
        while parent[u] != u:
            parent[u] = parent[parent[u]]
            u = parent[u]
        return u

    for (x, y, b) in voxels:
        for dx in (-1, 0, 1):
            for dy in (-1, 0, 1):
                for db in (-1, 0, 1):
                    q = (x + dx, y + dy, b + db)
                    if q in voxels and q != (x, y, b):
                        ra, rb = find((x, y, b)), find(q)
                        if ra != rb:
                            parent[max(ra, rb, key=lambda t: vid(*t))] = \
                                min(ra, rb, key=lambda t: vid(*t))
    return {v: vid(*find(v)) for v in voxels}


def test_st_clusters_matches_brute(spark):
    from pyspark.sql import functions as F

    from xutil_spark.operators.clustering import st_grid_clusters

    zoom, w, m = 6, 3600, 2
    n = 1 << zoom
    rng = np.random.default_rng(4242)
    # events: a few space-time blobs + noise
    rows = []
    eid = 0
    for _ in range(5):
        cx = rng.uniform(80, 120)
        cy = rng.uniform(25, 45)
        t0 = int(rng.integers(1_700_000_000, 1_700_000_000 + 5 * 86400))
        for _ in range(int(rng.integers(40, 120))):
            rows.append((eid, cx + rng.normal(0, 3.0), cy + rng.normal(0, 2.0),
                         t0 + int(rng.integers(0, 6 * 3600))))
            eid += 1
    for _ in range(150):
        rows.append((eid, rng.uniform(74, 133), rng.uniform(19, 52),
                     int(rng.integers(1_700_000_000,
                                      1_700_000_000 + 10 * 86400))))
        eid += 1
    pdf = pd.DataFrame(rows, columns=["event_id", "lon", "lat", "ep"])
    sdf = spark.createDataFrame(pdf).withColumn(
        "ts", F.timestamp_seconds(F.col("ep")))

    got = {(r["cell"], r["bkt"]): (r["cluster_id"], r["n_points"])
           for r in st_grid_clusters(sdf, zoom, w, min_count=m).collect()}

    # scalar voxelization with the same slippy-tile floor math
    def tile(lon, lat):
        import math
        x = int(math.floor((lon + 180.0) / 360.0 * n))
        lr = math.radians(lat)
        y = int(math.floor(
            (1.0 - math.log(math.tan(lr) + 1.0 / math.cos(lr)) / math.pi)
            / 2.0 * n))
        return x, y

    vox: dict = {}
    for _, r in pdf.iterrows():
        x, y = tile(r["lon"], r["lat"])
        b = int(r["ep"]) // w
        vox[(x, y, b)] = vox.get((x, y, b), 0) + 1
    dense = {k: c for k, c in vox.items() if c >= m}
    labels = _brute(dense, zoom)

    assert len(got) == len(dense)
    multi = 0
    for (x, y, b), c in dense.items():
        g = got[(int(cell_pack(x, y, zoom)), b)]
        assert g == (labels[(x, y, b)], c), (x, y, b)
        if labels[(x, y, b)] != (x * n + y) * (1 << 20) + b:
            multi += 1
    assert multi >= 5  # real multi-voxel clusters exercised
