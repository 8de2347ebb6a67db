"""Training-data-pipeline extensions: dedup variants, text stats, similarity
search, multimodal plumbing."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from repostcheckerbot_spark.operators import dedup_docs, multimodal, similarity, textstats


def _docs(spark, texts):
    return spark.createDataFrame([(i, t) for i, t in enumerate(texts)], ["doc_id", "text"])


def test_exact_dedup_keep_first(spark):
    d = _docs(spark, ["same text", "same  text", "other", "same\ntext"])
    kept = sorted(r.doc_id for r in dedup_docs.exact_dedup_keep_first(d).collect())
    assert kept == [0, 2]
    groups = dedup_docs.exact_dedup_groups(d).collect()
    assert len(groups) == 1 and groups[0].n_dups == 3 and groups[0].keeper_doc_id == 0


def test_ngram_jaccard_exact_values(spark):
    # identical docs → jaccard 1.0; disjoint docs → no pair at all
    d = _docs(spark, ["abcdefgh", "abcdefgh", "zzzzzzzz"])
    rows = dedup_docs.ngram_jaccard_pairs(d, k=5, min_jaccard=0.1).collect()
    assert len(rows) == 1
    assert (rows[0].doc_id_a, rows[0].doc_id_b, rows[0].jaccard) == (0, 1, 1.0)


def test_minhash_lsh_candidates_find_near_dups(spark):
    base = "the quick brown fox jumps over the lazy dog " * 6
    near = base[:-30] + "slightly changed tail here ok"
    other = "completely different content with nothing shared at all " * 5
    d = _docs(spark, [base, near, other])
    cands = dedup_docs.lsh_candidates_md5(d, k=5, bands=4, rows_per_band=2).collect()
    pairs = {(r.doc_id_a, r.doc_id_b) for r in cands}
    assert (0, 1) in pairs
    assert (0, 2) not in pairs and (1, 2) not in pairs


def test_simhash_identical_docs_equal_and_hamming_zero(spark):
    d = _docs(spark, ["hello world foo bar", "hello world foo bar", "xyz abc"])
    sims = {r.doc_id: (r.sim_hi, r.sim_lo) for r in dedup_docs.simhash64(d).collect()}
    assert sims[0] == sims[1]
    assert sims[0] != sims[2]
    pairs = dedup_docs.simhash_near_pairs(d, max_hamming=4).collect()
    assert any(p.doc_id_a == 0 and p.doc_id_b == 1 and p.hamming == 0 and p.score == 100.0 for p in pairs)


def test_quality_and_lang_and_tokens(spark):
    d = _docs(spark, ["the cat is on the mat and it is flat", "zxq wvu tsr qpo nml"])
    out = textstats.with_token_stats(d).select("doc_id", "n_ws_tokens").collect()
    assert {r.doc_id: r.n_ws_tokens for r in out} == {0: 10, 1: 5}
    langs = {r.doc_id: r[0] for r in d.select(textstats.lang_id(F.col("text")), "doc_id").collect()}
    assert langs == {0: "en", 1: "unk"}
    q = {r.doc_id: r[0] for r in d.select(textstats.quality_score(F.col("text")), "doc_id").collect()}
    assert q[0] > q[1]  # stopword-rich text scores higher


def test_cosine_topk_bruteforce_exact(spark):
    vecs = [
        (0, [1.0, 0.0]),
        (1, [0.9, 0.1]),
        (2, [0.0, 1.0]),
        (3, [-1.0, 0.0]),
    ]
    emb = spark.createDataFrame(vecs, ["vec_id", "embedding"])
    probes = emb.where(F.col("vec_id") == 0)
    out = similarity.cosine_topk_bruteforce(emb, probes, k=2).collect()
    got = [(r.corpus_id, r.rnk) for r in sorted(out, key=lambda r: r.rnk)]
    assert got == [(1, 1), (2, 2)]
    top = [r for r in out if r.rnk == 1][0]
    want = 0.9 / math.sqrt(0.9**2 + 0.1**2)
    assert abs(top.cos - round(want, 6)) < 1e-9


def test_cosine_lsh_recall_vs_bruteforce(spark, request):
    import random

    rng = random.Random(5)
    vecs = [(i, [rng.gauss(0, 1) for _ in range(16)]) for i in range(200)]
    emb = spark.createDataFrame(vecs, ["vec_id", "embedding"])
    probes = emb.where(F.col("vec_id") < 10)
    exact = {(r.probe_id, r.corpus_id) for r in similarity.cosine_topk_bruteforce(emb, probes, k=3).collect()}
    planes = similarity.make_planes(dim=16, n_planes=4, seed=7)
    approx = {(r.probe_id, r.corpus_id) for r in similarity.cosine_topk_lsh(emb, probes, planes, k=3).collect()}
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.2, f"ANN recall degenerate: {recall}"  # sanity floor; measured, not tuned


def test_multimodal_frame_signatures_and_video_score(spark):
    media = spark.createDataFrame(
        [
            (1, "video", b"FAKE-vid-a", 64, 64, 3),
            (2, "video", b"FAKE-vid-a", 64, 64, 3),  # identical payload
            (3, "image", b"FAKE-img-x", 32, 32, 1),
        ],
        schema=multimodal.MEDIA_SCHEMA,
    )
    sig = multimodal.extract_frame_signatures(media)
    rows = sig.collect()
    assert len(rows) == 3 + 3 + 1
    pairs = spark.createDataFrame([(1, 2), (1, 3)], ["media_id_a", "media_id_b"])
    scored = multimodal.video_pair_score(sig, pairs, thresh=5).collect()
    got = {(r.media_id_a, r.media_id_b): r for r in scored}
    # identical payloads → per-frame Hamming 0 → mean 0 → score 100
    assert (1, 2) in got and got[(1, 2)].score == 100.0
    assert (1, 3) not in got  # unrelated fake hashes ~32-bit Hamming → rejected


def test_multimodal_real_decode_raises(spark):
    assert pytest.raises(NotImplementedError, multimodal.fake_dhash, b"\x89PNG...", 0)
