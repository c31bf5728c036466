"""augment (raster/images.py): per-op pixel semantics pinned against
numpy ground truth on hand-built images."""

import numpy as np

from xutil_spark.kernels import codec as K_codec
from xutil_spark.raster.images import AUGMENT_OPS, _fnv1a64, augment


def _img_df(spark, arrays):
    rows = []
    for i, px in enumerate(arrays):
        h, w = px.shape[0], px.shape[1]
        rows.append((f"t{i:03d}", K_codec.encode_image(px, "raw"),
                     w, h, "raw", f"cap {i}", i))
    return spark.createDataFrame(
        rows, "image_id string, bytes binary, w int, h int, fmt string,"
              " caption string, phash long")


def _rand(h, w, seed):
    rng = np.random.RandomState(seed)
    return rng.randint(0, 256, size=(h, w, 3)).astype(np.uint8)


def _expected(px, op):
    if op == "hflip":
        return px[:, ::-1]
    if op == "vflip":
        return px[::-1, :]
    if op == "rot90":
        return np.rot90(px, k=-1)
    h, w = px.shape[0], px.shape[1]
    crop = px[h // 4:h // 4 + h // 2, w // 4:w // 4 + w // 2]
    ch, cw = h // 2, w // 2
    return crop[np.arange(h) * ch // h][:, np.arange(w) * cw // w]


def test_augment_ops_bit_exact(spark):
    arrays = [_rand(8, 12, s) for s in range(8)]
    out = {r.image_id: r for r in augment(_img_df(spark, arrays)).collect()}
    seen_ops = set()
    for i, px in enumerate(arrays):
        r = out[f"t{i:03d}"]
        op = AUGMENT_OPS[_fnv1a64(f"t{i:03d}") % 4]
        assert r.op == op
        seen_ops.add(op)
        exp = _expected(px, op)
        got = K_codec.decode_image(bytes(r.bytes), r.w, r.h, "raw")
        assert r.w == exp.shape[1] and r.h == exp.shape[0]
        assert np.array_equal(got, exp), (i, op)
    # 8 hash-selected ops should cover several distinct kinds
    assert len(seen_ops) >= 3


def test_augment_rot90_swaps_dims_and_sum_invariant(spark):
    px = _rand(6, 10, 99)
    # force every op by trying ids until each appears
    ids, arrays = [], []
    want = set(AUGMENT_OPS)
    i = 0
    while want and i < 200:
        op = AUGMENT_OPS[_fnv1a64(f"t{i:03d}") % 4]
        if op in want:
            want.discard(op)
            ids.append(i)
            arrays.append(px)
        i += 1
    df = _img_df(spark, [_rand(6, 10, 99)] * len(ids))
    # rebuild with the exact chosen ids
    rows = [(f"t{j:03d}", K_codec.encode_image(px, "raw"), 10, 6, "raw",
             "c", 0) for j in ids]
    df = spark.createDataFrame(
        rows, "image_id string, bytes binary, w int, h int, fmt string,"
              " caption string, phash long")
    out = {r.op: r for r in augment(df).collect()}
    assert out["rot90"].w == 6 and out["rot90"].h == 10
    base_sum = int(px.astype(np.int64).sum())
    for op in ("hflip", "vflip", "rot90"):
        got = K_codec.decode_image(bytes(out[op].bytes), out[op].w,
                                   out[op].h, "raw")
        assert int(got.astype(np.int64).sum()) == base_sum
    # crop2x replicates each kept pixel 2x2 → sum = 4 × crop sum
    crop = px[6 // 4:6 // 4 + 3, 10 // 4:10 // 4 + 5]
    gotc = K_codec.decode_image(bytes(out["crop2x"].bytes), 10, 6, "raw")
    assert int(gotc.astype(np.int64).sum()) == 4 * int(
        crop.astype(np.int64).sum())


def test_augment_odd_dimensions_no_index_error(spark):
    """Regression: crop2x's nearest-resize used arange(h)//2, which
    indexes row h//2 (out of bounds on the h//2-row crop) for odd h —
    an IndexError that killed the Spark task.  Odd widths and heights
    must round-trip through every op."""
    arrays = [_rand(5, 7, s) for s in range(12)] + [_rand(9, 4, 77)]
    out = {r.image_id: r for r in augment(_img_df(spark, arrays)).collect()}
    assert len(out) == len(arrays)
    seen = set()
    for i, px in enumerate(arrays):
        r = out[f"t{i:03d}"]
        op = AUGMENT_OPS[_fnv1a64(f"t{i:03d}") % 4]
        seen.add(op)
        exp = _expected(px, op)
        got = K_codec.decode_image(bytes(r.bytes), r.w, r.h, "raw")
        assert np.array_equal(got, exp), (i, op)
    assert "crop2x" in seen  # the regression op actually ran
