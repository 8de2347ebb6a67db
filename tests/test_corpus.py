"""Unit tests for corpus-level curation operators: decontamination, packing
manifest, stratified sampling / domain mixing, BM25."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from repostcheckerbot_spark.operators import corpus
from repostcheckerbot_spark.operators.corpus import (
    RATE_DENOM,
    bm25_scores,
    decontaminate,
    mix_domains,
    pack_manifest,
    solve_mix_rates,
    stratified_sample,
)


# ---------------------------------------------------------------- decontaminate
def test_decontaminate_known_answer(spark):
    """Doc sharing a 5-gram with the benchmark is flagged with the exact
    count; disjoint docs pass; docs shorter than n trivially pass."""
    train = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta epsilon zeta"),  # shares 2 5-grams
            (2, "one two three four five six"),          # disjoint
            (3, "tiny doc"),                             # < 5 words → 0 ngrams
        ],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame(
        [(9, "alpha beta gamma delta epsilon zeta eta")], "doc_id long, text string"
    )
    out = {r["doc_id"]: r for r in decontaminate(train, bench, n=5).collect()}
    assert len(out) == 3
    # doc 1: 2 distinct 5-grams, both in the benchmark (which has 3)
    assert out[1]["n_ngrams"] == 2 and out[1]["n_contaminated"] == 2
    assert out[1]["contamination_micros"] == 1_000_000
    assert not out[1]["pass_decontamination"]
    assert out[2]["n_ngrams"] == 2 and out[2]["n_contaminated"] == 0
    assert out[2]["pass_decontamination"]
    assert out[3]["n_ngrams"] == 0 and out[3]["pass_decontamination"]
    assert out[3]["contamination_micros"] == 0


def test_decontaminate_counts_distinct_ngrams_once(spark):
    """A repeated n-gram inside one doc counts once (distinct per doc)."""
    train = spark.createDataFrame(
        [(1, "a b c d e a b c d e")], "doc_id long, text string"
    )
    bench = spark.createDataFrame([(9, "a b c d e")], "doc_id long, text string")
    row = decontaminate(train, bench, n=5).collect()[0]
    # 6 positions but 'a b c d e' appears twice → 5 distinct; 1 contaminated
    assert row["n_ngrams"] == 5
    assert row["n_contaminated"] == 1


# ---------------------------------------------------------------- pack_manifest
def test_pack_manifest_conservation_and_capacity(spark):
    """Every doc's tokens are fully assigned; every sequence holds exactly
    `capacity` tokens except possibly the last one of each shard; doc spans
    are contiguous."""
    docs = spark.createDataFrame(
        [(i, " ".join(f"w{j}" for j in range(5 + (i * 7) % 23))) for i in range(40)]
        + [(100, ""), (101, "   ")],  # zero-token docs → no rows
        "doc_id long, text string",
    )
    cap = 16
    out = pack_manifest(docs, capacity=cap, n_shards=3).collect()
    assert all(r["doc_id"] < 100 for r in out)

    # conservation: per-doc sum of tokens_in_seq == its token count
    per_doc = {}
    for r in out:
        per_doc.setdefault(r["doc_id"], []).append(r)
    for i in range(40):
        n_tok = 5 + (i * 7) % 23
        rows = sorted(per_doc[i], key=lambda r: r["seq_id"])
        assert sum(r["tokens_in_seq"] for r in rows) == n_tok
        seqs = [r["seq_id"] for r in rows]
        assert seqs == list(range(seqs[0], seqs[-1] + 1)), "doc spans contiguous seqs"
        assert len({r["shard_id"] for r in rows}) == 1

    # capacity: each (shard, seq) total == cap except the shard's last seq
    per_seq, last_seq = {}, {}
    for r in out:
        key = (r["shard_id"], r["seq_id"])
        per_seq[key] = per_seq.get(key, 0) + r["tokens_in_seq"]
        last_seq[r["shard_id"]] = max(last_seq.get(r["shard_id"], -1), r["seq_id"])
    for (shard, seq), total in per_seq.items():
        if seq < last_seq[shard]:
            assert total == cap, f"non-final seq {(shard, seq)} holds {total} != {cap}"
        else:
            assert 0 < total <= cap


def test_pack_manifest_deterministic_under_repartition(spark):
    docs = spark.createDataFrame(
        [(i, " ".join(f"w{j}" for j in range(10 + i % 9))) for i in range(30)],
        "doc_id long, text string",
    )
    a = sorted(map(tuple, pack_manifest(docs, 8, 2).collect()))
    b = sorted(map(tuple, pack_manifest(docs.repartition(7), 8, 2).collect()))
    assert a == b


# ----------------------------------------------------- stratified sample / mix
def test_stratified_sample_rates_and_determinism(spark):
    docs = spark.createDataFrame(
        [(i, "src%d" % (i % 3), "t") for i in range(3000)],
        "doc_id long, source string, text string",
    )
    rates = {"src0": RATE_DENOM, "src1": 5000}  # src2 absent → dropped
    out = stratified_sample(docs, rates).select("doc_id", "source").collect()
    by_src = {}
    for r in out:
        by_src.setdefault(r["source"], set()).add(r["doc_id"])
    assert len(by_src.get("src0", ())) == 1000  # rate 100% keeps all
    assert "src2" not in by_src
    n1 = len(by_src.get("src1", ()))
    assert 350 <= n1 <= 650  # ~50% of 1000, md5-binomial
    # deterministic: same membership on a second run
    out2 = {r["doc_id"] for r in stratified_sample(docs, rates).select("doc_id").collect()}
    assert {r["doc_id"] for r in out} == out2


def test_solve_mix_rates_water_filling():
    # src_small has only 100 docs but weight 0.5 → saturates at 100%; its
    # shortfall flows to the big domains, still in 1:1 proportion.
    counts = {"small": 100, "big_a": 10_000, "big_b": 10_000}
    weights = {"small": 0.5, "big_a": 0.25, "big_b": 0.25}
    rates = solve_mix_rates(counts, weights, budget=2100)
    assert rates["small"] == RATE_DENOM
    # remaining 2000 split 1000/1000 → rate 10% of 10k
    assert rates["big_a"] == rates["big_b"] == 1000

    # budget ≥ total → everything kept
    assert solve_mix_rates(counts, weights, budget=10**9) == {
        "small": RATE_DENOM, "big_a": RATE_DENOM, "big_b": RATE_DENOM
    }
    # zero budget / empty weights
    assert solve_mix_rates(counts, weights, budget=0) == {k: 0 for k in weights}
    assert solve_mix_rates({}, weights, budget=10) == {k: 0 for k in weights}
    # unsaturated simple proportional case
    r2 = solve_mix_rates({"a": 1000, "b": 1000}, {"a": 0.75, "b": 0.25}, budget=400)
    assert r2["a"] == 3000 and r2["b"] == 1000


def test_mix_domains_end_to_end(spark):
    docs = spark.createDataFrame(
        [(i, "heavy" if i < 2000 else "light", "t") for i in range(2200)],
        "doc_id long, source string, text string",
    )
    sampled, rates = mix_domains(docs, {"heavy": 0.5, "light": 0.5}, budget=400)
    # light has only 200 docs for a 200-target → saturates; heavy rate ≈ 10%
    assert rates["light"] == RATE_DENOM
    assert rates["heavy"] == 1000
    got = sampled.groupBy("source").agg(F.count(F.lit(1)).alias("n")).collect()
    by = {r["source"]: r["n"] for r in got}
    assert by["light"] == 200
    assert 120 <= by["heavy"] <= 280  # hash-binomial around 200


# ------------------------------------------------------------------------ bm25
def test_bm25_known_answer(spark):
    """Hand-computed Okapi BM25 on a 3-doc corpus, k1=1.2 b=0.75."""
    docs = spark.createDataFrame(
        [
            (1, "spark spark join"),
            (2, "join filter scan"),
            (3, "filter scan sort"),
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in bm25_scores(docs, ["spark", "join"]).collect()}
    assert set(out) == {1, 2}  # doc 3 matches nothing

    def idf(df, n=3):
        return math.log(1.0 + (n - df + 0.5) / (df + 0.5))

    def contrib(tf, df, dl, avgdl=3.0, k1=1.2, b=0.75):
        return idf(df) * (tf * (k1 + 1)) / (tf + k1 * (1 - b + b * dl / avgdl))

    exp1 = contrib(2, 1, 3) + contrib(1, 2, 3)  # spark tf=2 df=1; join tf=1 df=2
    exp2 = contrib(1, 2, 3)
    assert out[1]["n_terms_matched"] == 2
    assert out[1]["score_micros"] == math.floor(exp1 * 1_000_000)
    assert out[2]["n_terms_matched"] == 1
    assert out[2]["score_micros"] == math.floor(exp2 * 1_000_000)
    assert out[1]["score_micros"] > out[2]["score_micros"]


def test_bm25_case_insensitive_and_blank(spark):
    docs = spark.createDataFrame(
        [(1, "SPARK Join"), (2, ""), (3, "   ")], "doc_id long, text string"
    )
    out = bm25_scores(docs, ["spark"]).collect()
    assert [r["doc_id"] for r in out] == [1]
