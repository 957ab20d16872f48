"""Similarity search over an embedding column (array<float>).

Two tiers, per the standard large-corpus design:

* ``cosine_topk``  — exact brute-force top-k (crossJoin + windowed
  row_number). O(Q·N) — the verification baseline, and the right tool
  when Q (queries) is small: Spark broadcasts the Q side so the scan of
  the N side stays embarrassingly parallel with NO shuffle of N.

* ``lsh_topk``     — random-hyperplane (sign) LSH: b deterministic
  pseudo-hyperplanes derived from the portable md5 hash (no RNG state to
  ship), each vector → b-bit bucket; top-k computed only within matching
  buckets, multi-probe by also matching buckets at Hamming distance ≤ 1.
  At 10^12 rows this is the scale path: the bucket id is a shuffle key
  that partitions the corpus, and each query probes O(b+1) buckets.

Both are pure DataFrame plans (fold-based dot products, window top-k) —
exact SQL oracles exist for both in queries.py.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from .simdedup import cosine_expr
from .text import portable_hash64

# 6 planes / 64 buckets with Hamming≤1 multi-probe: a query scans ~7/64
# of the corpus. Recall is regime-dependent (sign-LSH collision prob. is
# 1−θ/π per plane): ≈0.8 for true near-dups (cosine ≥0.9), much lower for
# low-cosine neighbors — the bench reports measured recall vs exact.
N_PLANES = 6


def _as_double(vec_col: str) -> Column:
    return F.transform(F.col(vec_col), lambda x: x.cast("double"))


def _plane_weight(plane: int, dim: Column) -> Column:
    """Deterministic pseudo-random hyperplane weight in [-0.5, 0.5):
    w(plane, dim) = (H(plane || '_' || dim) % 1000)/1000 - 0.5 — identical
    arithmetic is reproducible in any SQL engine via the md5-prefix hash."""
    key = F.concat_ws("_", F.lit(plane).cast("string"), dim.cast("string"))
    return (portable_hash64(key) % 1000) / F.lit(1000.0) - F.lit(0.5)


def hyperplane_bucket(vec_col: str, n_planes: int = N_PLANES) -> Column:
    """→ int bucket id: bit p = 1 iff Σ_d w(p,d)·v[d] > 0."""
    v = _as_double(vec_col)
    bits = []
    for p in range(n_planes):
        proj = F.aggregate(
            F.zip_with(
                v,
                F.sequence(F.lit(0), F.size(v) - 1),
                lambda x, i: x * _plane_weight(p, i),
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        bits.append(F.when(proj > 0, F.lit(1 << p)).otherwise(F.lit(0)))
    out = bits[0]
    for b in bits[1:]:
        out = out + b
    return out


def cosine_topk(
    emb: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact brute-force cosine top-k: → (query_id, neighbor_id, rank,
    cosine). Self-matches excluded; ties broken by neighbor_id for
    determinism. ``queries`` must be small — it is explicitly broadcast."""
    base = emb.select(F.col(id_col).alias("neighbor_id"), _as_double(vec_col).alias("nv"))
    q = queries.select(F.col(id_col).alias("query_id"), _as_double(vec_col).alias("qv"))
    scored = (
        base.crossJoin(F.broadcast(q))
        .where(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(cosine_expr(F.col("qv"), F.col("nv")), 6).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cosine")
    )


def lsh_topk(
    emb: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_planes: int = N_PLANES,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: candidates = corpus vectors whose hyperplane
    bucket is within Hamming distance ≤ 1 of the query's bucket
    (multi-probe), exact cosine + window top-k within candidates only.

    → (query_id, neighbor_id, rank, cosine). Recall < 1 by design; the
    bench reports recall vs ``cosine_topk`` on the same input.
    """
    base = emb.select(
        F.col(id_col).alias("neighbor_id"),
        _as_double(vec_col).alias("nv"),
        hyperplane_bucket(vec_col, n_planes).alias("nb"),
    )
    q = queries.select(
        F.col(id_col).alias("query_id"),
        _as_double(vec_col).alias("qv"),
        hyperplane_bucket(vec_col, n_planes).alias("qb"),
    )
    cand = (
        base.join(
            F.broadcast(q),
            F.bit_count(
                F.col("nb").cast("bigint").bitwiseXOR(F.col("qb").cast("bigint"))
            )
            <= 1,
        )
        .where(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(cosine_expr(F.col("qv"), F.col("nv")), 6).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        cand.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cosine")
    )
