"""PPRL (CLK Bloom-filter linkage) tests — operators/pprl.py.

The load-bearing check is the pure-Python referee: an independent
re-implementation of the encoding (hashlib.md5, no Spark, no shared code)
must reproduce every CLK bit-exactly. The DuckDB twin of the same algebra
is exercised end-to-end by the pprl_clk_linkage oracle."""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from repostcheckerbot_spark.operators import pprl


def _referee_clk(fields: dict[str, str]) -> int:
    """Independent plain-Python CLK: field-salted double-hashed bigrams."""
    clk = 0
    for field, value in fields.items():
        nm = (value or "").strip().lower()
        for g in {nm[i : i + 2] for i in range(len(nm) - 1)}:
            for i in range(pprl.CLK_K):
                h = hashlib.md5(f"{field}:{i}:{g}".encode()).hexdigest()
                clk |= 1 << (int(h[:2], 16) % pprl.CLK_BITS)
    return clk


def _dice(a: int, b: int) -> int:
    return 2 * pprl.MILLION * (a & b).bit_count() // (a.bit_count() + b.bit_count())


def test_clk_encode_matches_python_referee(spark):
    rows = [
        (1, "Amara Almeida", "BUILDING"),
        (2, "amara almeida", "building"),  # case/trim-insensitive
        (3, "  Bruno Baranov ", None),
        (4, "x", ""),  # sub-bigram fields -> empty filter
        (5, None, None),
    ]
    df = spark.createDataFrame(rows, "rec_id long, name string, seg string")
    got = {r["rec_id"]: r["clk"] for r in pprl.clk_encode(df, "rec_id", ["name", "seg"]).collect()}
    for rec_id, name, seg in rows:
        assert got[rec_id] == _referee_clk({"name": name or "", "seg": seg or ""})
    assert got[1] == got[2]  # normalization collapses case/whitespace
    assert got[4] == 0 and got[5] == 0
    assert all(0 <= v < (1 << pprl.CLK_BITS) for v in got.values())


def test_identical_names_dice_exactly_one(spark):
    df = spark.createDataFrame([(2, "nadia moreau"), (3, "nadia moreau")], "rec_id long, name string")
    enc = pprl.clk_encode(df, "rec_id", ["name"])
    left = enc.where(F.col("rec_id") % 2 == 0)
    right = enc.where(F.col("rec_id") % 2 == 1)
    [row] = pprl.clk_dice_pairs(left, right).collect()
    assert (row["rec_id_a"], row["rec_id_b"], row["dice_millionths"]) == (2, 3, pprl.MILLION)


def test_typo_pair_survives_threshold_distinct_names_do_not(spark):
    """'bruno jansen' / 'bruno jensen' chunk-cohabit (verified via the
    referee below — a typo flips up to 2·CLK_K·2 bits, so cohabitation is
    likely but not pigeonhole-guaranteed; ~33% of the fixture's typo'd
    names cohabit at 4 chunks), score in the 0.7-1.0 band, and must be
    linked; an unrelated name must not pair with either."""
    a = _referee_clk({"name": "bruno jansen"})
    b = _referee_clk({"name": "bruno jensen"})
    cohabit = any(
        (a >> (pprl.CHUNK_BITS * j)) & ((1 << pprl.CHUNK_BITS) - 1)
        == (b >> (pprl.CHUNK_BITS * j)) & ((1 << pprl.CHUNK_BITS) - 1)
        for j in range(pprl.N_CHUNKS)
    )
    assert cohabit, "fixture invariant: this typo pair shares a chunk"
    df = spark.createDataFrame(
        [(2, "bruno jansen"), (3, "bruno jensen"), (5, "vera yamamoto")],
        "rec_id long, name string",
    )
    enc = pprl.clk_encode(df, "rec_id", ["name"])
    left = enc.where(F.col("rec_id") == 2)
    right = enc.where(F.col("rec_id") != 2)
    pairs = {(r["rec_id_a"], r["rec_id_b"]): r["dice_millionths"] for r in pprl.clk_dice_pairs(left, right).collect()}
    assert pairs == {(2, 3): _dice(a, b)}
    assert 700_000 <= pairs[(2, 3)] < pprl.MILLION


def test_pigeonhole_recall_hamming_le_3(spark):
    """Any pair within Hamming 3 of a 4-chunk CLK must be generated: flip
    3 bits spread across chunks of a dense filter and check the pair
    survives candidate generation (threshold 0 isolates recall)."""
    base = (1 << pprl.CLK_BITS) - 1 & 0x5A5A5A5A5A5A5A5A  # arbitrary dense 60-bit pattern
    perturbed = base ^ (1 << 2) ^ (1 << 20) ^ (1 << 50)  # 3 flips in 3 different chunks
    left = spark.createDataFrame([(0, base)], "rec_id long, clk long")
    right = spark.createDataFrame([(1, perturbed)], "rec_id long, clk long")
    got = pprl.clk_dice_pairs(left, right, threshold_millionths=0).collect()
    assert len(got) == 1 and got[0]["dice_millionths"] == _dice(base, perturbed)


def test_empty_filters_never_pair(spark):
    left = spark.createDataFrame([(0, 0)], "rec_id long, clk long")
    right = spark.createDataFrame([(1, 0)], "rec_id long, clk long")
    # both CLKs empty: they chunk-cohabit (all chunks 0) but are dropped
    # by the set-bit guard rather than dividing by zero
    assert pprl.clk_dice_pairs(left, right, threshold_millionths=0).count() == 0


def test_encode_is_single_stage_no_shuffle(spark):
    """The encoder must stay a narrow projection: no Exchange in the plan."""
    df = spark.createDataFrame([(1, "amara almeida")], "rec_id long, name string")
    plan = pprl.clk_encode(df, "rec_id", ["name"])._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_clk_encode_fuzz_corpus_matches_referee(spark):
    """200 seeded fuzz strings (punctuation, digits, accents, whitespace
    runs, repeats, empties) encoded in ONE Spark job must all match the
    plain-Python referee bit-for-bit — the cross-engine md5/substring/
    lower semantics this operator leans on."""
    import random

    rng = random.Random(42)
    alphabet = "abcdefghijklmnopqrstuvwxyz0123456789 .,'-_#éüñ"
    corpus = [""] + ["a"] + ["  "] + [
        "".join(rng.choice(alphabet) for _ in range(rng.randint(0, 40))) for _ in range(197)
    ]
    df = spark.createDataFrame(list(enumerate(corpus)), "rec_id long, name string")
    got = {r["rec_id"]: r["clk"] for r in pprl.clk_encode(df, "rec_id", ["name"]).collect()}
    for i, s in enumerate(corpus):
        assert got[i] == _referee_clk({"name": s}), repr(s)


def _referee_clk_wide(fields: dict[str, str], n_words: int = 2) -> list[int]:
    m = n_words * pprl.CLK_BITS
    words = [0] * n_words
    for field, value in fields.items():
        nm = (value or "").strip().lower()
        for g in {nm[i : i + 2] for i in range(len(nm) - 1)}:
            for i in range(pprl.CLK_K):
                pos = int(hashlib.md5(f"{field}:{i}:{g}".encode()).hexdigest()[:4], 16) % m
                words[pos // pprl.CLK_BITS] |= 1 << (pos % pprl.CLK_BITS)
    return words


def test_clk_encode_wide_matches_referee_and_dice(spark):
    """120-bit (2-word) CLK: encoder parity vs the plain-Python wide
    referee, and dice_millionths_wide agreement on every pair — the
    widening path the 60-bit docstring promises."""
    names = ["amara almeida", "amara almeida", "amere elmeide", "vera yamamoto", "x", None]
    df = spark.createDataFrame(list(enumerate(names)), "rec_id long, name string")
    enc = pprl.clk_encode_wide(df, "rec_id", ["name"], n_words=2)
    got = {r["rec_id"]: list(r["clk_words"]) for r in enc.collect()}
    for i, s in enumerate(names):
        assert got[i] == _referee_clk_wide({"name": s or ""}), repr(s)
    assert got[4] == [0, 0] and got[5] == [0, 0]

    a = enc.where(F.col("rec_id") == 0).select(F.col("clk_words").alias("wa"))
    for j, s in enumerate(names[:4]):
        b = enc.where(F.col("rec_id") == j).select(F.col("clk_words").alias("wb"))
        [row] = a.crossJoin(b).select(pprl.dice_millionths_wide("wa", "wb").alias("d")).collect()
        ra, rb = _referee_clk_wide({"name": names[0]}), _referee_clk_wide({"name": s or ""})
        inter = sum((x & y).bit_count() for x, y in zip(ra, rb))
        denom = sum(x.bit_count() for x in ra) + sum(x.bit_count() for x in rb)
        assert row["d"] == 2 * pprl.MILLION * inter // denom
    # identical names -> exactly 1.0 at 120 bits too
    b1 = enc.where(F.col("rec_id") == 1).select(F.col("clk_words").alias("wb"))
    [r1] = a.crossJoin(b1).select(pprl.dice_millionths_wide("wa", "wb").alias("d")).collect()
    assert r1["d"] == pprl.MILLION


def _referee_wide_pairs(left, right, n_words=2, threshold=700_000):
    """Plain-Python record-space referee for clk_dice_pairs_wide: chunk
    cohabitation + integer Dice, quadratic on purpose (oracle duty only)."""
    cb, nc = pprl.CHUNK_BITS, pprl.N_CHUNKS
    mask = (1 << cb) - 1

    def chunks(words):
        return [
            (wi * nc + j, (w >> (j * cb)) & mask)
            for wi, w in enumerate(words)
            for j in range(nc)
        ]

    out = {}
    for ra, wa in left:
        if sum(x.bit_count() for x in wa) == 0:
            continue
        for rb, wb in right:
            if sum(x.bit_count() for x in wb) == 0:
                continue
            if not set(chunks(wa)) & set(chunks(wb)):
                continue
            inter = sum((x & y).bit_count() for x, y in zip(wa, wb))
            denom = sum(x.bit_count() for x in wa) + sum(x.bit_count() for x in wb)
            d = 2 * pprl.MILLION * inter // denom
            if d >= threshold:
                out[(ra, rb)] = d
    return out


def test_clk_dice_pairs_wide_matches_referee(spark):
    """End-to-end wide (120-bit) blocking join vs the quadratic referee on
    a corpus with identical pairs, typo'd pairs, unrelated names, and
    empty/short strings — the candidate join the 60-bit path had and the
    wide path gained in r5."""
    names = [
        "amara almeida", "bruno jansen", "chiara okafor", "daniyar petrov",
        "elena vasquez", "farid nakamura", "greta lindqvist", "hassan oyelaran",
        "", "x",
    ]
    left_rows = [(2 * i, n) for i, n in enumerate(names)]
    typo = {1: "bruno jensen", 3: "deniyer petrov"}
    right_rows = [(2 * i + 1, typo.get(i, n)) for i, n in enumerate(names)]
    ldf = spark.createDataFrame(left_rows, "rec_id long, name string")
    rdf = spark.createDataFrame(right_rows, "rec_id long, name string")
    enc_l = pprl.clk_encode_wide(ldf, "rec_id", ["name"], n_words=2)
    enc_r = pprl.clk_encode_wide(rdf, "rec_id", ["name"], n_words=2)
    got = {
        (r["rec_id_a"], r["rec_id_b"]): r["dice_millionths"]
        for r in pprl.clk_dice_pairs_wide(enc_l, enc_r, threshold_millionths=500_000).collect()
    }
    ref_l = [(i, _referee_clk_wide({"name": n})) for i, n in left_rows]
    ref_r = [(i, _referee_clk_wide({"name": n})) for i, n in right_rows]
    want = _referee_wide_pairs(ref_l, ref_r, threshold=500_000)
    assert got == want
    # sanity on the fixture itself: every identical pair linked at 1.0
    for i in range(8):
        if i not in typo:
            assert got[(2 * i, 2 * i + 1)] == pprl.MILLION
