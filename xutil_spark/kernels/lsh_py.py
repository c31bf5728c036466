"""Independent scalar reimplementation of the random-hyperplane LSH
path, used ONLY to build computed-VALUES oracles for the driver gate
(same pattern as kernels/s2.cell_id_py for `s2_cells` and the pure
XXH64 oracle for `simhash_docs`).

Everything here is pure-Python big-int / float arithmetic — no numpy,
no shared code with operators/similarity.py:

* ``splitmix64_py``  — scalar splitmix64 (public constants), mod-2^64
  int arithmetic instead of uint64 vector ops;
* ``plane_py``       — hyperplane coefficient (b, j) for a seed, the
  (x >> 11) / 2^53 - 0.5 uniform expansion done on python ints;
* ``bucket_py``      — sign-bit bucket id via a sequential scalar dot
  (numpy's pairwise-summed matmul agrees on every sf vector; a sign
  could only flip for |projection| below ~1e-13, and the driver gate
  input is fixed, so agreement is pinned by the oracle run itself);
* ``cos6_py``        — cosine in the engine's exact operation order
  (sequential left-fold dot and norms, one multiply then divide) and
  Spark ROUND半-up 6-dp semantics via ``decimal``.

The engine path under test (operators/similarity.py) is vectorized
numpy over Arrow batches; these scalars share no code with it, so a
driver MATCH cross-checks hyperplane generation, bucketing, candidate
generation, scoring and ranking end-to-end.
"""

from __future__ import annotations

from decimal import ROUND_HALF_UP, Decimal

_M64 = (1 << 64) - 1


def splitmix64_py(i: int) -> int:
    """Scalar splitmix64 (public constants), unsigned 64-bit result."""
    z = (i + 0x9E3779B97F4A7C15) & _M64
    z = ((z ^ (z >> 30)) * 0xBF58476D1CE4E5B9) & _M64
    z = ((z ^ (z >> 27)) * 0x94D049BB133111EB) & _M64
    return (z ^ (z >> 31)) & _M64


def plane_py(seed: int, n_bits: int, dim: int) -> list[list[float]]:
    """Hyperplane matrix [n_bits][dim]; coefficient (b, j) derives from
    index seed*1_000_003 + b*dim + j.  (x >> 11) is a 53-bit int, so
    /2^53 and -0.5 are exact in float64 — values are bit-identical to
    the engine's vectorized generator by construction."""
    return [
        [
            (splitmix64_py(seed * 1_000_003 + b * dim + j) >> 11)
            / float(1 << 53) - 0.5
            for j in range(dim)
        ]
        for b in range(n_bits)
    ]


def bucket_py(vec: list[float], planes: list[list[float]]) -> int:
    """Sign-bit bucket id: bit b set iff plane_b · vec > 0 (strict,
    matching the engine's `> 0`); sequential scalar dot."""
    out = 0
    for b, pl in enumerate(planes):
        acc = 0.0
        for x, p in zip(vec, pl):
            acc += x * p
        if acc > 0.0:
            out |= 1 << b
    return out


def cos6_py(a: list[float], b: list[float]) -> float:
    """Cosine(a, b) in the engine's exact float64 operation order
    (sequential left folds, dot / (norm_a * norm_b)), then Spark
    ROUND(_, 6) = BigDecimal HALF_UP on the binary double."""
    dot = 0.0
    na = 0.0
    nb = 0.0
    for x, y in zip(a, b):
        dot += x * y
    for x in a:
        na += x * x
    for y in b:
        nb += y * y
    score = dot / (na ** 0.5 * nb ** 0.5)
    return float(
        Decimal(score).quantize(Decimal("0.000001"), rounding=ROUND_HALF_UP)
    )


def near_dup_pairs_py(
    ids: list[int], vecs: list[list[float]], threshold: float,
    n_bits: int = 8, seed: int = 42,
) -> list[tuple[int, int, float]]:
    """Mirror of embedding_near_dup_pairs(n_bits>0): single-table
    bucket self-join (a < b), exact rounded cosine, threshold filter,
    distinct.  Returns sorted (a, b, score) tuples."""
    planes = plane_py(seed, n_bits, len(vecs[0]))
    buckets: dict[int, list[int]] = {}
    for i, v in enumerate(vecs):
        buckets.setdefault(bucket_py(v, planes), []).append(i)
    out = set()
    for members in buckets.values():
        for i in members:
            for j in members:
                if ids[i] < ids[j]:
                    s = cos6_py(vecs[i], vecs[j])
                    if s >= threshold:
                        out.add((ids[i], ids[j], s))
    return sorted(out)


def topk_lsh_py(
    q_ids: list[int], ids: list[int], vecs: list[list[float]],
    k: int = 5, n_bits: int = 8, n_tables: int = 4, probe_bits: int = 1,
    seed: int = 42,
) -> list[tuple[int, int, float, int]]:
    """Mirror of cosine_topk_lsh: multi-table buckets, hamming-1 query
    multiprobe, candidate union, rounded-cosine re-score, rank by
    (score DESC, nn_id ASC), top k.  Queries are corpus members
    selected by id (the contract query uses vec_id < 50)."""
    by_id = {v: i for i, v in enumerate(ids)}
    cand: dict[int, set[int]] = {q: set() for q in q_ids}
    for t in range(n_tables):
        planes = plane_py(seed + t, n_bits, len(vecs[0]))
        table: dict[int, list[int]] = {}
        for i, v in enumerate(vecs):
            table.setdefault(bucket_py(v, planes), []).append(i)
        for q in q_ids:
            b0 = bucket_py(vecs[by_id[q]], planes)
            probes = [b0] + (
                [b0 ^ (1 << b) for b in range(n_bits)] if probe_bits else []
            )
            for pb in probes:
                for i in table.get(pb, ()):
                    if ids[i] != q:
                        cand[q].add(i)
    out = []
    for q in q_ids:
        qv = vecs[by_id[q]]
        scored = sorted(
            ((cos6_py(qv, vecs[i]), ids[i]) for i in cand[q]),
            key=lambda sc: (-sc[0], sc[1]),
        )
        for rank, (s, nn) in enumerate(scored[:k], start=1):
            out.append((q, nn, s, rank))
    return out
