"""Privacy-preserving record linkage (PPRL): CLK Bloom-filter encoding +
Dice-coefficient matching.

Public technique: Schnell, Bachteler & Reiher, "Privacy-preserving record
linkage using Bloom filters" (BMC Medical Informatics 2009) and the
follow-up Cryptographic Long-term Key (CLK) of Schnell et al. 2011. Each
data owner encodes its quasi-identifier fields (names, categories, ...)
into ONE fixed-length Bloom filter per record by hashing character bigrams
``k`` times with field-salted hash functions; the linkage unit sees only
the bit vectors and scores pairs with the Dice coefficient. A single-
character typo perturbs at most two bigrams, so high Dice survives noise
— the same fuzzy-match decision the reference makes on plaintext with
difflib ratios (reference database.py:395, the full-table
SequenceMatcher loop thresholded at database.py:396), generalized to the
setting where NO party may see the other party's plaintext.

Spark-first design:

- **Encoding is pure built-in column algebra** — md5 → conv → shiftleft →
  aggregate-OR — whole-stage-codegen'd, zero Python, zero shuffle: every
  record's CLK derives from its own bigram array in one projection.
- **m = 60 bits in one BIGINT**, so Hamming/Dice are two ``bit_count``
  calls. Production PPRL uses m ≈ 500-1000; 60 keeps the sandbox DuckDB
  oracle in a single BIGINT (DuckDB raises on ``1::BIGINT << 63``, so the
  top nibble stays clear by construction). The algebra is m-agnostic:
  :func:`clk_encode_wide` / :func:`dice_millionths_wide` implement the
  widened ``array<bigint>``-of-60-bit-words path (referee-verified at
  m = 120 in test_pprl).
- **Candidate generation is pigeonhole chunk blocking**: the 60-bit CLK
  splits into 4 disjoint 15-bit chunks; any pair with Hamming distance
  ≤ 3 shares at least one chunk verbatim (same Manku-style scheme as
  ``dedup_docs.simhash_near_pairs``). Only chunk-cohabiting pairs are
  scored — an equi-join on (chunk_idx, chunk_value) that Catalyst plans
  as a shuffled hash/sort-merge join; AQE splits any hot chunk value.
  At 100 TB this is the standard LSH shape: 4× row replication, then a
  key-partitioned join — no broadcast of either side needed, no O(n²).
- **Scores are integer millionths** (``dice_millionths``) so the value
  hash is engine- and partitioning-stable (same convention as the
  Jaccard / Fellegi-Sunter paths — no float accumulation order anywhere).

Privacy caveat (documented, not solved here): plain CLKs are vulnerable
to frequency attacks when m is small; production deployments add salted
record-level keys / hardening (xor-folding, Bloom-and-flip). This module
implements the *linkage dataflow*, which is the Spark-shaped part.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: CLK width in bits. Must stay ≤ 62 so every ``1 << pos`` fits a signed
#: BIGINT in BOTH engines (DuckDB raises on shifting into the sign bit).
CLK_BITS = 60

#: Hash functions per bigram (the classic double-hashing count is 2 in
#: the sandbox; production uses 15-30 at m ≈ 1000).
CLK_K = 2

#: Pigeonhole chunking for candidate generation: 4 chunks × 15 bits.
N_CHUNKS = 4
CHUNK_BITS = CLK_BITS // N_CHUNKS

MILLION = 1_000_000


def _bigram_masks_sql(field_expr: str, field_salt: str) -> str:
    """SQL fragment: array of per-bigram OR-masks for one normalized field.

    For each distinct character bigram ``g`` of ``lower(trim(field))`` the
    mask sets CLK_K bit positions, position_i = first-two-hex-digits of
    ``md5('<salt>:<i>:' || g)`` mod CLK_BITS — exactly reproducible in
    DuckDB via strpos-nibble arithmetic (see ``clk_oracle_bits_sql``).
    Records shorter than 2 chars contribute an empty array (NOT a
    descending Spark ``sequence``)."""
    nm = f"lower(trim(coalesce({field_expr}, '')))"
    gram = f"substring({nm}, i, 2)"
    masks = " | ".join(
        f"shiftleft(CAST(1 AS BIGINT), CAST(conv(substring(md5(concat('{field_salt}:{i}:', g)), 1, 2), 16, 10) AS INT) % {CLK_BITS})"
        for i in range(CLK_K)
    )
    return (
        f"CASE WHEN length({nm}) < 2 THEN CAST(array() AS array<bigint>) "
        f"ELSE transform(array_distinct(transform(sequence(1, length({nm}) - 1), i -> {gram})), g -> {masks}) END"
    )


def clk_encode(df: DataFrame, id_col: str, fields: list[str], out_col: str = "clk") -> DataFrame:
    """(id, quasi-identifier fields) → (id, clk BIGINT).

    One narrow projection per record — no explode, no shuffle, no Python.
    Fields are salted individually so the same bigram in different fields
    sets different bits (CLK composition per Schnell et al. 2011)."""
    mask_arrays = ", ".join(_bigram_masks_sql(f, f) for f in fields)
    clk = F.expr(f"aggregate(flatten(array({mask_arrays})), CAST(0 AS BIGINT), (acc, x) -> acc | x)")
    return df.select(F.col(id_col), clk.alias(out_col))


def _chunks(df: DataFrame, clk_col: str) -> DataFrame:
    """Explode each CLK into its N_CHUNKS (chunk_idx, chunk_value) keys,
    keeping the input columns. Arithmetic shift + mask ≡ logical shift
    for the kept low bits."""
    j = F.explode(F.sequence(F.lit(0), F.lit(N_CHUNKS - 1))).alias("chunk_idx")
    out = df.select("*", j)
    # SQL shiftright (unlike the Python wrapper) takes a column bit count
    chunk_val = F.expr(f"shiftright({clk_col}, chunk_idx * {CHUNK_BITS}) & {(1 << CHUNK_BITS) - 1}")
    return out.withColumn("chunk_val", chunk_val)


def dice_millionths(clk_a: Column, clk_b: Column) -> Column:
    """Integer Dice coefficient: floor(2·|a∧b| / (|a|+|b|) · 10⁶)."""
    inter = F.bit_count(clk_a.bitwiseAND(clk_b))
    denom = F.bit_count(clk_a) + F.bit_count(clk_b)
    return F.floor(F.lit(2 * MILLION) * inter / denom).cast("long")


def clk_dice_pairs(
    left: DataFrame,
    right: DataFrame,
    id_col: str = "rec_id",
    clk_col: str = "clk",
    threshold_millionths: int = 700_000,
) -> DataFrame:
    """Two-source PPRL matching: chunk-blocked Dice scoring.

    Exact-recall guarantee (pigeonhole): every pair with Hamming ≤
    N_CHUNKS - 1 = 3 is generated. High-Dice pairs of well-filled CLKs
    have small Hamming, so in practice the blocked join is a superset of
    the Dice-threshold matches of interest; the guarantee is stated in
    Hamming terms because Dice alone does not bound per-chunk disagreement
    (documented, same honesty convention as simhash_near_pairs).

    Returns (rec_id_a, rec_id_b, dice_millionths) for chunk-cohabiting
    pairs with Dice ≥ threshold and at least one set bit on each side.

    Scale shape: blocking + scoring run in DISTINCT-CLK space, then the
    matching encoding pairs expand back to record pairs. Identical
    records (and identically-encoding quasi-identifiers — the common case
    in dirty corpora) collapse to one value before the O(candidates)
    work, so the chunk join is bounded by distinct encodings, not
    records; cohabitation and Dice depend only on the CLK value, so the
    output is provably identical to the record-space join."""
    ua = left.select(F.col(clk_col).alias("_clk_a")).where(F.bit_count(clk_col) > 0).distinct()
    ub = right.select(F.col(clk_col).alias("_clk_b")).where(F.bit_count(clk_col) > 0).distinct()
    ca = _chunks(ua, "_clk_a")
    cb = _chunks(ub, "_clk_b")
    cand = ca.join(cb, on=["chunk_idx", "chunk_val"]).select("_clk_a", "_clk_b").distinct()
    d = dice_millionths(F.col("_clk_a"), F.col("_clk_b"))
    matches = cand.select("_clk_a", "_clk_b", d.alias("dice_millionths")).where(
        F.col("dice_millionths") >= threshold_millionths
    )
    return (
        matches.join(left.select(F.col(id_col).alias("rec_id_a"), F.col(clk_col).alias("_clk_a")), "_clk_a")
        .join(right.select(F.col(id_col).alias("rec_id_b"), F.col(clk_col).alias("_clk_b")), "_clk_b")
        .select("rec_id_a", "rec_id_b", "dice_millionths")
    )


def clk_oracle_bits_sql(field_salt: str) -> str:
    """DuckDB fragment computing the SAME bit position as the Spark
    encoder for a bigram column ``g``: first two md5 hex digits via
    strpos-nibble arithmetic (proven equal to Spark's conv(..,16,10))."""
    def pos(i: int) -> str:
        h = f"md5('{field_salt}:{i}:' || g)"
        return (
            f"(((strpos('0123456789abcdef', substr({h}, 1, 1)) - 1) * 16"
            f" + (strpos('0123456789abcdef', substr({h}, 2, 1)) - 1)) % {CLK_BITS})"
        )

    return " | ".join(f"(1::BIGINT << {pos(i)})" for i in range(CLK_K))


def clk_encode_wide(
    df: DataFrame,
    id_col: str,
    fields: list[str],
    n_words: int = 2,
    out_col: str = "clk_words",
) -> DataFrame:
    """Widened CLK: m = n_words × CLK_BITS bits as ``array<bigint>`` of
    60-bit words — the production-width path (m ≈ 500-1000 per Schnell et
    al.; n_words=2 → 120 bits already separates clean/dirty Dice bands far
    better than one word). Bit position = first FOUR md5 hex digits mod m
    (two digits only address 256 < m positions); word = pos // CLK_BITS,
    bit = pos % CLK_BITS. Same codegen'd no-shuffle algebra as
    :func:`clk_encode`, one OR-aggregate per word. Test-verified against
    the plain-Python referee (test_pprl); the 60-bit variant carries the
    DuckDB oracle."""
    m = n_words * CLK_BITS

    def word_expr(w: int) -> str:
        per_field = []
        for f in fields:
            nm = f"lower(trim(coalesce({f}, '')))"
            gram = f"substring({nm}, i, 2)"
            masks = " | ".join(
                f"(CASE WHEN CAST(conv(substring(md5(concat('{f}:{i}:', g)), 1, 4), 16, 10) AS INT) % {m} div {CLK_BITS} = {w} "
                f"THEN shiftleft(CAST(1 AS BIGINT), CAST(conv(substring(md5(concat('{f}:{i}:', g)), 1, 4), 16, 10) AS INT) % {m} % {CLK_BITS}) "
                f"ELSE CAST(0 AS BIGINT) END)"
                for i in range(CLK_K)
            )
            per_field.append(
                f"CASE WHEN length({nm}) < 2 THEN CAST(array() AS array<bigint>) "
                f"ELSE transform(array_distinct(transform(sequence(1, length({nm}) - 1), i -> {gram})), g -> {masks}) END"
            )
        arrays = ", ".join(per_field)
        return f"aggregate(flatten(array({arrays})), CAST(0 AS BIGINT), (acc, x) -> acc | x)"

    words = ", ".join(word_expr(w) for w in range(n_words))
    return df.select(F.col(id_col), F.expr(f"array({words})").alias(out_col))


def dice_millionths_wide(clk_a_col: str, clk_b_col: str) -> Column:
    """Integer Dice over word-array CLKs: per-word popcounts summed via
    zip_with/aggregate, integer `div` — still pure column algebra, NULL
    when both filters are empty (callers guard like the 60-bit path)."""

    def popcount(col: str) -> str:
        return f"aggregate(transform({col}, w -> bit_count(w)), 0, (acc, v) -> acc + v)"

    inter = (
        f"aggregate(zip_with({clk_a_col}, {clk_b_col}, (x, y) -> bit_count(x & y)),"
        " 0, (acc, v) -> acc + v)"
    )
    return F.expr(
        f"CAST((2000000 * CAST({inter} AS BIGINT))"
        f" div ({popcount(clk_a_col)} + {popcount(clk_b_col)}) AS BIGINT)"
    )
