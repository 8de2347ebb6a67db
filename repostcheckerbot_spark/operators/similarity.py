"""Approximate-nearest-neighbor / similarity search over an embedding column.

Input: ``embeddings(vec_id:int64, embedding:array<float>, label:int)``.

- brute-force cosine top-k: the correctness baseline. Dot products via the
  native higher-order ``zip_with`` + ``aggregate`` (JVM-side); top-k via a
  window. O(N·M) — fine for a probe set, the oracle for the ANN variants.
- LSH-bucketed variant (random hyperplane signs): the scale path — candidates
  only within matching sign-sketch buckets, then exact cosine re-rank.

At 100 TB the brute-force path is only ever probe-batch × corpus with the
probe side broadcast; the bucketed path shuffles each side once on the sketch
key.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v)


def _norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(F.transform(a, lambda x: x * x), F.lit(0.0), lambda acc, v: acc + v))


def cosine(a: Column, b: Column) -> Column:
    return _dot(a, b) / (_norm(a) * _norm(b))


def cosine_topk_bruteforce(
    embeddings: DataFrame, probes: DataFrame, k: int = 5, id_col: str = "vec_id", vec_col: str = "embedding"
) -> DataFrame:
    """For each probe vector: the k most-cosine-similar corpus vectors
    (excluding itself). Probe side is broadcast — corpus is never shuffled."""
    corpus = embeddings.select(F.col(id_col).alias("corpus_id"), F.col(vec_col).alias("cv"))
    p = probes.select(F.col(id_col).alias("probe_id"), F.col(vec_col).alias("pv"))
    scored = (
        corpus.join(F.broadcast(p), F.col("probe_id") != F.col("corpus_id"))
        .withColumn("cos", F.round(cosine(F.col("pv"), F.col("cv")), 6))
    )
    w = Window.partitionBy("probe_id").orderBy(F.desc("cos"), F.asc("corpus_id"))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= k)
        .select("probe_id", "corpus_id", "cos", "rnk")
    )


def with_sign_sketch(embeddings: DataFrame, planes: list[list[float]], vec_col: str = "embedding") -> DataFrame:
    """Random-hyperplane LSH: sketch bit i = sign(v · plane_i). Planes are a
    deterministic host-side list (seeded by the caller), broadcast as literals
    inside the plan — no Python at eval time."""
    sketch = None
    for i, plane in enumerate(planes):
        arr = F.array(*[F.lit(float(x)) for x in plane])
        bit = (_dot(F.col(vec_col), arr) > 0).cast("int")
        sketch = bit if sketch is None else sketch * 2 + bit
    return embeddings.withColumn("sketch", sketch.cast("int"))


def cosine_topk_lsh(
    embeddings: DataFrame,
    probes: DataFrame,
    planes: list[list[float]],
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """ANN: candidates share the sign sketch (all ``len(planes)`` hyperplane
    sides), exact cosine re-rank inside the bucket. Recall < 1 by design —
    compare against cosine_topk_bruteforce to measure it."""
    corpus = with_sign_sketch(embeddings, planes, vec_col).select(
        F.col(id_col).alias("corpus_id"), F.col(vec_col).alias("cv"), "sketch"
    )
    p = with_sign_sketch(probes, planes, vec_col).select(
        F.col(id_col).alias("probe_id"), F.col(vec_col).alias("pv"), "sketch"
    )
    scored = (
        corpus.join(F.broadcast(p), "sketch")
        .where(F.col("probe_id") != F.col("corpus_id"))
        .withColumn("cos", F.round(cosine(F.col("pv"), F.col("cv")), 6))
    )
    w = Window.partitionBy("probe_id").orderBy(F.desc("cos"), F.asc("corpus_id"))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= k)
        .select("probe_id", "corpus_id", "cos", "rnk")
    )


def make_planes(dim: int, n_planes: int, seed: int = 42) -> list[list[float]]:
    """Deterministic pseudo-random hyperplanes (host-side, seeded)."""
    import random

    rng = random.Random(seed)
    return [[rng.gauss(0.0, 1.0) for _ in range(dim)] for _ in range(n_planes)]
