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

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
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


def make_plane_tables(dim: int, n_tables: int, n_planes: int, seed: int = 42) -> list[list[list[float]]]:
    """``n_tables`` independent sign-sketch tables (seeded, deterministic)."""
    return [make_planes(dim, n_planes, seed=seed * 1000 + t) for t in range(n_tables)]


def _multi_sketch(df: DataFrame, tables: list[list[list[float]]], id_alias: str, vec_alias: str, id_col: str, vec_col: str) -> DataFrame:
    """(id, vec, table_id, sketch) rows — one per sketch table. Sketches are
    pure column algebra (plane literals folded into the plan), so this is a
    narrow ×n_tables explode, no Python at eval time."""
    out = df
    for t, planes in enumerate(tables):
        out = with_sign_sketch(out, planes, vec_col).withColumnRenamed("sketch", f"_sk{t}")
    sketches = F.array(*[F.struct(F.lit(t).alias("table_id"), F.col(f"_sk{t}").alias("sketch")) for t in range(len(tables))])
    return (
        out.select(
            F.col(id_col).alias(id_alias),
            F.col(vec_col).alias(vec_alias),
            F.explode(sketches).alias("s"),
        )
        .select(id_alias, vec_alias, F.col("s.table_id").alias("table_id"), F.col("s.sketch").alias("sketch"))
    )


def cosine_topk_lsh_multi(
    embeddings: DataFrame,
    probes: DataFrame,
    tables: list[list[list[float]]],
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Multi-table sign-sketch ANN: candidates share ANY table's full sketch
    (the standard multi-table LSH recall amplifier — one sketch table has
    P(candidate) = (1−θ/π)^b for angle θ; T independent tables lift recall to
    1−(1−p)^T at T× candidate cost). One equi-join on (table_id, sketch);
    exact cosine re-rank; pair dedup before ranking."""
    corpus = _multi_sketch(embeddings, tables, "corpus_id", "cv", id_col, vec_col)
    p = _multi_sketch(probes, tables, "probe_id", "pv", id_col, vec_col)
    scored = (
        corpus.join(F.broadcast(p), ["table_id", "sketch"])
        .where(F.col("probe_id") != F.col("corpus_id"))
        .dropDuplicates(["probe_id", "corpus_id"])
        .withColumn("cos", F.round(cosine(F.col("pv"), F.col("cv")), 6))
    )
    w = Window.partitionBy("probe_id").orderBy(F.desc("cos"), F.asc("corpus_id"))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= k)
        .select("probe_id", "corpus_id", "cos", "rnk")
    )


# --------------------------------------------------------------------------
# IVF (inverted-file) ANN: coarse quantizer + nprobe search
# --------------------------------------------------------------------------
def sample_centroids(embeddings: DataFrame, n_centroids: int, id_col: str = "vec_id", vec_col: str = "embedding") -> list[list[float]]:
    """Deterministic coarse quantizer: the ``n_centroids`` smallest-id vectors
    (k-means init placeholder — at cluster scale run k-means|| offline and
    persist the codebook; the search path below is unchanged). k×dim floats:
    a legitimately driver-sized artifact, broadcast into the assignment UDF."""
    rows = (
        embeddings.select(id_col, vec_col).orderBy(id_col).limit(n_centroids).collect()
    )
    return [[float(x) for x in r[vec_col]] for r in rows]


def _centroid_topn_udf(centroids: list[list[float]], n: int):
    """pandas UDF: embedding → the ``n`` nearest centroid ids by cosine.
    One numpy matmul per Arrow batch — no per-row Python."""
    C = np.asarray(centroids, dtype=np.float64)
    C = C / np.maximum(np.linalg.norm(C, axis=1, keepdims=True), 1e-12)

    @F.pandas_udf(T.ArrayType(T.IntegerType()))
    def topn(vecs: pd.Series) -> pd.Series:
        X = np.asarray([np.asarray(v, dtype=np.float64) for v in vecs])
        X = X / np.maximum(np.linalg.norm(X, axis=1, keepdims=True), 1e-12)
        sims = X @ C.T
        # deterministic: argsort desc with centroid-id tiebreak via stable sort
        order = np.argsort(-sims, axis=1, kind="stable")[:, :n]
        return pd.Series([row.astype("int32").tolist() for row in order])

    return topn


def with_ivf_cell(embeddings: DataFrame, centroids: list[list[float]], vec_col: str = "embedding") -> DataFrame:
    """Assign every vector to its nearest centroid (its IVF cell)."""
    topn = _centroid_topn_udf(centroids, 1)
    return embeddings.withColumn("cell", topn(F.col(vec_col))[0])


def cosine_topk_ivf(
    embeddings: DataFrame,
    probes: DataFrame,
    centroids: list[list[float]],
    k: int = 5,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF ANN: corpus vectors live in their nearest-centroid cell; a probe
    scans only its ``nprobe`` nearest cells, exact cosine re-rank inside.

    100-TB shape: the corpus is partitioned by ``cell`` ONCE (scan-side narrow
    assignment, one numpy matmul per Arrow batch), so a probe batch touches
    nprobe/n_centroids of the data and the join is a broadcast of the (small)
    probe side against cell-pruned corpus partitions. Recall is tunable via
    nprobe — measured against brute force in ann_recall queries/tests."""
    corpus = with_ivf_cell(embeddings, centroids, vec_col).select(
        F.col(id_col).alias("corpus_id"), F.col(vec_col).alias("cv"), "cell"
    )
    topn = _centroid_topn_udf(centroids, nprobe)
    p = probes.select(
        F.col(id_col).alias("probe_id"),
        F.col(vec_col).alias("pv"),
        F.explode(topn(F.col(vec_col))).alias("cell"),
    )
    scored = (
        corpus.join(F.broadcast(p), "cell")
        .where(F.col("probe_id") != F.col("corpus_id"))
        .withColumn("cos", F.round(cosine(F.col("pv"), F.col("cv")), 6))
    )
    w = Window.partitionBy("probe_id").orderBy(F.desc("cos"), F.asc("corpus_id"))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= k)
        .select("probe_id", "corpus_id", "cos", "rnk")
    )


def ann_recall(ann: DataFrame, brute: DataFrame) -> DataFrame:
    """recall@k of an ANN result vs the brute-force ground truth: ONE row
    (n_probes, n_truth, n_hits, recall_millionths) — integer-exact, so the
    number is stable across engines and runs (fixed seeds everywhere)."""
    truth = brute.select("probe_id", "corpus_id")
    hits = ann.select("probe_id", "corpus_id").join(truth, ["probe_id", "corpus_id"], "left_semi")
    return (
        truth.agg(
            F.countDistinct("probe_id").alias("n_probes"),
            F.count(F.lit(1)).alias("n_truth"),
        )
        .crossJoin(hits.agg(F.count(F.lit(1)).alias("n_hits")))
        .select(
            "n_probes",
            "n_truth",
            "n_hits",
            F.floor(F.col("n_hits") * 1_000_000 / F.col("n_truth")).cast("long").alias("recall_millionths"),
        )
    )


# --------------------------------------------------------------------------
# embedding near-dup channel (dedup family over array<float> columns)
# --------------------------------------------------------------------------
def embedding_near_dup_pairs(
    embeddings: DataFrame,
    centroids: list[list[float]],
    min_cos: float = 0.9,
    nprobe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding-cosine near-duplicate PAIRS (id_a < id_b, cos ≥ min_cos) —
    the ANN rendering of the dedup family's "embedding channel": every vector
    probes its ``nprobe`` nearest IVF cells, so near-identical vectors (which
    share or neighbor a cell) collide without any all-pairs join.

    Scale shape: candidates = one equi-join on ``cell`` after narrow
    assignment; candidate count is Σ_cell |cell|·(probe hits in cell), capped
    by cell granularity — never O(N²). Recall for true near-dups (cos ≥ 0.9)
    is high because such pairs' cells coincide at small angle; measured in
    tests against the exact threshold join."""
    assigned = with_ivf_cell(embeddings, centroids, vec_col)
    corpus = assigned.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb"), "cell")
    topn = _centroid_topn_udf(centroids, nprobe)
    probes = embeddings.select(
        F.col(id_col).alias("id_a"),
        F.col(vec_col).alias("va"),
        F.explode(topn(F.col(vec_col))).alias("cell"),
    )
    return (
        probes.join(corpus, "cell")
        .where(F.col("id_a") < F.col("id_b"))
        .dropDuplicates(["id_a", "id_b"])
        .withColumn("cos", F.round(cosine(F.col("va"), F.col("vb")), 6))
        .where(F.col("cos") >= min_cos)
        .select("id_a", "id_b", "cos")
    )
