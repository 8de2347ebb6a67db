"""Deduplication family over the ``documents`` table — the training-data-
pipeline generalization of the reference's repost detection.

Variants (each a `queries()` entry with a DuckDB oracle where the hash is
portable):

- exact_dedup        — hash-groupBy on normalized text (portable: sha/md5)
- minhash_md5        — MinHash with md5 as the hash family (portable — DuckDB
                       computes the identical signature)
- lsh_candidates_md5 — banded LSH over the md5 MinHash (portable)
- ngram_jaccard      — exact n-gram Jaccard similarity join (set-based; the
                       verify-stage ground truth for MinHash estimates)
- simhash            — 64-bit SimHash over word tokens via per-bit majority
                       (portable: md5-derived bits + integer arithmetic)

The production pipeline uses the xxhash64 family (blocking.py) — faster, JVM-
native. The md5 family here exists so correctness is *oracle-checkable*; the
algorithms are identical up to the hash function.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def normalized(docs: DataFrame, text_col: str = "text") -> DataFrame:
    return docs.withColumn("norm_text", F.regexp_replace(F.col(text_col), r"\s+", ""))


def exact_dedup_groups(docs: DataFrame) -> DataFrame:
    """Groups of byte-identical (post-normalization) documents: one row per
    duplicated content hash with the member count and the keeper (min id)."""
    return (
        normalized(docs)
        .withColumn("content_md5", F.md5("norm_text"))
        .groupBy("content_md5")
        .agg(F.count(F.lit(1)).alias("n_dups"), F.min("doc_id").alias("keeper_doc_id"))
        .where(F.col("n_dups") > 1)
    )


def exact_dedup_keep_first(docs: DataFrame) -> DataFrame:
    """The dedup itself: keep the min doc_id per content hash (the distributed
    rendering of dropDuplicates with a deterministic survivor)."""
    ranked = normalized(docs).withColumn("content_md5", F.md5("norm_text"))
    keepers = ranked.groupBy("content_md5").agg(F.min("doc_id").alias("doc_id"))
    return ranked.join(keepers, ["content_md5", "doc_id"], "left_semi").select(docs.columns)


def _shingle_expr(col: str, k: int) -> str:
    return (
        f"array_distinct(transform(sequence(1, greatest(length({col}) - {k - 1}, 1)),"
        f" i -> substring({col}, i, {k})))"
    )


def minhash_md5(docs: DataFrame, k: int = 5, num_hashes: int = 8) -> DataFrame:
    """Portable MinHash: signature[s] = min over shingles of md5(s || ':' || x).

    Emitted as one row per (doc_id, seed, minhash) so the oracle compare is
    hash-order-insensitive and type-simple.
    """
    n = normalized(docs).withColumn("shingles", F.expr(_shingle_expr("norm_text", k)))
    sig = n.select(
        "doc_id",
        F.explode(
            F.expr(
                f"transform(sequence(0, {num_hashes - 1}),"
                f" s -> struct(s as seed, array_min(transform(shingles, x -> md5(concat(cast(s as string), ':', x)))) as minhash))"
            )
        ).alias("e"),
    )
    return sig.select("doc_id", F.col("e.seed").alias("seed"), F.col("e.minhash").alias("minhash"))


def lsh_candidates_md5(docs: DataFrame, k: int = 5, bands: int = 4, rows_per_band: int = 2) -> DataFrame:
    """Banded LSH over the md5 MinHash: candidate (doc_id_a < doc_id_b) pairs
    sharing at least one band bucket."""
    num = bands * rows_per_band
    sig = minhash_md5(docs, k=k, num_hashes=num)
    banded = (
        sig.withColumn("band_id", (F.col("seed") / rows_per_band).cast("int"))
        .groupBy("doc_id", "band_id")
        .agg(F.md5(F.concat_ws(",", F.array_sort(F.collect_list("minhash")))).alias("band_hash"))
    )
    a, b = banded.alias("a"), banded.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band_id") == F.col("b.band_id")) & (F.col("a.band_hash") == F.col("b.band_hash")),
        )
        .where(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(F.col("a.doc_id").alias("doc_id_a"), F.col("b.doc_id").alias("doc_id_b"))
        .distinct()
    )


def ngram_jaccard_pairs(docs: DataFrame, k: int = 5, min_jaccard: float = 0.3) -> DataFrame:
    """Exact character-k-gram Jaccard similarity join (doc_id_a < doc_id_b).

    Set-based plan: explode distinct shingles → self-join on shingle →
    count(∩) per pair → |∪| = |A|+|B|−|∩|. The shingle join IS the blocking —
    pairs sharing no shingle never materialize (no cross join).
    """
    n = normalized(docs).withColumn("shingles", F.expr(_shingle_expr("norm_text", k)))
    sizes = n.select("doc_id", F.size("shingles").alias("n_sh"))
    ex = n.select("doc_id", F.explode("shingles").alias("sh"))
    inter = (
        ex.alias("a")
        .join(ex.alias("b"), "sh")
        .where(F.col("a.doc_id") < F.col("b.doc_id"))
        .groupBy(F.col("a.doc_id").alias("doc_id_a"), F.col("b.doc_id").alias("doc_id_b"))
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    return (
        inter.join(sizes.withColumnRenamed("doc_id", "doc_id_a").withColumnRenamed("n_sh", "n_a"), "doc_id_a")
        .join(sizes.withColumnRenamed("doc_id", "doc_id_b").withColumnRenamed("n_sh", "n_b"), "doc_id_b")
        .withColumn("jaccard", F.round(F.col("n_inter") / (F.col("n_a") + F.col("n_b") - F.col("n_inter")), 6))
        .where(F.col("jaccard") >= min_jaccard)
        .select("doc_id_a", "doc_id_b", "jaccard")
    )


#: hex-digit lookup shared with the oracle (1-based position - 1 = value)
HEX_DIGITS = "0123456789abcdef"


def simhash64(docs: DataFrame) -> DataFrame:
    """64-bit SimHash over lower-cased whitespace word tokens.

    Portable construction (DuckDB states the identical formula): token bit b
    = bit (b mod 4) of the hex digit at position 1 + b//4 of md5(token); the
    simhash bit is the majority vote over tokens. Emitted as two 32-bit
    halves (sim_hi, sim_lo) so XOR/bit_count stay in signed-long-safe range.

    Computed in ONE Arrow-batched pandas UDF pass (md5 per token + numpy
    nibble-unpack + vote matrix). A first cut exploded 64 bit-rows per token
    through two shuffles — 19M rows and 15 s at sf0.1 for what is ~1 s of
    vectorized work; the values are bit-identical (hex-digit construction
    below matches the SQL formula: digest byte → high/low nibble = hex digit,
    nibble bit (b mod 4) = the SQL's div/pow/mod chain).
    """
    import hashlib
    import re

    import numpy as np
    from pyspark.sql import types as T

    ws = re.compile(r"\s+")

    @F.pandas_udf(T.ArrayType(T.LongType()))
    def simhash_udf(texts: pd.Series) -> pd.Series:
        his, los = [], []
        weights_lo = (1 << np.arange(32, dtype=np.int64))
        for t in texts:
            toks = [x for x in ws.split((t or "").lower().strip()) if x]
            if not toks:
                his.append(0)
                los.append(0)
                continue
            digests = np.frombuffer(
                b"".join(hashlib.md5(tok.encode("utf-8")).digest() for tok in toks), dtype=np.uint8
            ).reshape(len(toks), 16)
            # hex digit j of the md5 string = high nibble (j even) / low
            # nibble (j odd) of digest byte j//2; bit b uses digit b//4,
            # bit position (b % 4) — LSB-first within the digit, matching
            # (digit div 2^(b%4)) % 2 in the SQL oracle.
            nibbles = np.empty((len(toks), 32), dtype=np.uint8)
            nibbles[:, 0::2] = digests >> 4
            nibbles[:, 1::2] = digests & 0x0F
            digits = nibbles[:, :16]  # bits 0..63 use hex digits 0..15
            bits = (digits[:, :, None] >> np.arange(4)[None, None, :]) & 1  # (n,16,4)
            bits = bits.reshape(len(toks), 64)
            votes = (bits.astype(np.int32) * 2 - 1).sum(axis=0)
            bitval = (votes > 0).astype(np.int64)
            los.append(int((bitval[:32] * weights_lo).sum()))
            his.append(int((bitval[32:] * weights_lo).sum()))
        return pd.Series([[h, l] for h, l in zip(his, los)])

    return docs.select("doc_id", simhash_udf(F.col("text")).alias("s")).select(
        "doc_id", F.col("s")[0].alias("sim_hi"), F.col("s")[1].alias("sim_lo")
    )


def simhash_near_pairs(docs: DataFrame, max_hamming: int = 6) -> DataFrame:
    """Near-dup pairs by SimHash Hamming distance — the reference's
    dhash-Hamming accept rule re-expressed (hamming < thresh, strictly,
    database.py:451,594; score = ((thresh-d)/thresh)*100, database.py:454).

    Candidate generation blocks on sim_hi (half-signature equality) — the
    standard multi-probe shortcut; exhaustive at small scale via both halves.
    """
    s = simhash64(docs)
    a, b = s.alias("a"), s.alias("b")
    pairs = (
        a.join(b, (F.col("a.sim_hi") == F.col("b.sim_hi")) | (F.col("a.sim_lo") == F.col("b.sim_lo")))
        .where(F.col("a.doc_id") < F.col("b.doc_id"))
        .withColumn(
            "hamming",
            F.bit_count(F.col("a.sim_hi").bitwiseXOR(F.col("b.sim_hi")))
            + F.bit_count(F.col("a.sim_lo").bitwiseXOR(F.col("b.sim_lo"))),
        )
        .where(F.col("hamming") < max_hamming)
    )
    return pairs.select(
        F.col("a.doc_id").alias("doc_id_a"),
        F.col("b.doc_id").alias("doc_id_b"),
        "hamming",
        F.round((max_hamming - F.col("hamming")) / max_hamming * 100.0, 6).alias("score"),
    )
