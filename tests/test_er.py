"""Unit tests for entity-resolution operators: Fellegi–Sunter linkage,
survivorship, token-sort ratio, TF-IDF cosine."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from repostcheckerbot_spark.operators.er import (
    fs_score_pairs,
    fs_weights,
    golden_records,
    tfidf_cosine_pairs,
    token_sort_key,
    token_sort_ratio,
)


# ------------------------------------------------------------ Fellegi–Sunter
def test_fs_weights_known_values():
    w = fs_weights({"f": (0.9, 0.1)})
    assert abs(w["f"][0] - math.log2(9.0)) < 1e-12
    assert abs(w["f"][1] - math.log2(0.1 / 0.9)) < 1e-12


def test_fs_score_pairs_known_answer(spark):
    """Two records agreeing on both fields score w_a(name)+w_a(city); a
    disagreeing pair gets the disagreement weights; cross-block pairs never
    meet."""
    recs = spark.createDataFrame(
        [
            (1, 10, "ann smith", "berlin"),
            (2, 10, "ann smith", "berlin"),   # full agreement with 1
            (3, 10, "bob jones", "munich"),   # full disagreement with 1,2
            (4, 99, "ann smith", "berlin"),   # other block — never paired
        ],
        "rec_id long, blk int, name string, city string",
    )
    mu = {"name": (0.9, 0.01), "city": (0.8, 0.1)}
    w = fs_weights(mu)
    out = fs_score_pairs(
        recs,
        ["blk"],
        {
            "name": F.col("name_a") == F.col("name_b"),
            "city": F.col("city_a") == F.col("city_b"),
        },
        mu,
    )
    rows = {(r["rec_id_a"], r["rec_id_b"]): r for r in out.collect()}
    assert set(rows) == {(1, 2), (1, 3), (2, 3)}
    exp_match = math.floor((0.0 + w["city"][0] + w["name"][0]) * 1_000_000)
    exp_nomatch = math.floor((0.0 + w["city"][1] + w["name"][1]) * 1_000_000)
    assert rows[(1, 2)]["fs_score_micros"] == exp_match
    assert rows[(1, 2)]["agree_name"] and rows[(1, 2)]["agree_city"]
    assert rows[(1, 3)]["fs_score_micros"] == exp_nomatch
    assert not rows[(1, 3)]["agree_name"]

    # threshold filters to matches only
    matched = fs_score_pairs(
        recs,
        ["blk"],
        {
            "name": F.col("name_a") == F.col("name_b"),
            "city": F.col("city_a") == F.col("city_b"),
        },
        mu,
        threshold_bits=1.0,
    ).collect()
    assert {(r["rec_id_a"], r["rec_id_b"]) for r in matched} == {(1, 2)}


def test_fs_link_two_sources_known_answer(spark):
    """Clean-clean linkage: pairs are left×right only (never within one
    source), each pair appears once with no id-ordering dedup, scores use
    the same frozen algebra, and the threshold-implied promotion is
    lossless under the two-source topology."""
    from repostcheckerbot_spark.operators.er import fs_link_two_sources

    left = spark.createDataFrame(
        [
            (1, 10, "ann smith", "berlin"),
            (2, 10, "ann smith", "berlin"),   # duplicate NAME within left —
            (3, 10, "bob jones", "munich"),   # must never pair with rec 1
        ],
        "rec_id long, blk int, name string, city string",
    )
    right = spark.createDataFrame(
        [
            (101, 10, "ANN SMITH", "berlin"),
            (102, 10, "carol wu", "berlin"),
            (103, 99, "ann smith", "berlin"),  # other block — never paired
        ],
        "rec_id long, blk int, name string, city string",
    )
    mu = {"name": (0.9, 0.001), "city": (0.8, 0.1)}
    agreements = {
        "name": F.lower(F.col("name_a")) == F.lower(F.col("name_b")),
        "city": F.col("city_a") == F.col("city_b"),
    }
    w = fs_weights(mu)
    out = fs_link_two_sources(left, right, ["blk"], agreements, mu)
    rows = {(r["rec_id_a"], r["rec_id_b"]): r for r in out.collect()}
    # all left×right block-10 pairs, exactly once, left id always on the _a side
    assert set(rows) == {(1, 101), (1, 102), (2, 101), (2, 102), (3, 101), (3, 102)}
    exp_match = math.floor((0.0 + w["city"][0] + w["name"][0]) * 1_000_000)
    assert rows[(1, 101)]["fs_score_micros"] == exp_match
    assert rows[(1, 101)]["agree_name"] and rows[(1, 101)]["agree_city"]
    assert not rows[(3, 101)]["agree_name"]

    # promotion losslessness: name necessary at thr → equi-join result identical
    thr = w["name"][1] + w["city"][0] + 0.5
    base = {
        (r["rec_id_a"], r["rec_id_b"], r["fs_score_micros"])
        for r in fs_link_two_sources(
            left, right, ["blk"], agreements, mu, threshold_bits=thr
        ).collect()
    }
    promoted = {
        (r["rec_id_a"], r["rec_id_b"], r["fs_score_micros"])
        for r in fs_link_two_sources(
            left, right, ["blk"], agreements, mu, threshold_bits=thr,
            equi_agreements={"name": F.lower(F.col("name"))},
        ).collect()
    }
    assert promoted == base == {(1, 101, exp_match), (2, 101, exp_match)}


def test_fs_equi_agreement_promotion_lossless(spark):
    """Threshold-implied blocking: promoting a provably-necessary equality
    field into the join key must not change the matched-pair set; a field
    that is NOT necessary at the threshold must not be promoted (the
    unfiltered pair space still reaches the scorer)."""
    recs = spark.createDataFrame(
        [
            (1, 10, "ann smith", "berlin"),
            (2, 10, "ann smith", "berlin"),
            (3, 10, "ann smith", "munich"),  # name agrees, city differs
            (4, 10, "bob jones", "berlin"),  # city agrees, name differs
        ],
        "rec_id long, blk int, name string, city string",
    )
    mu = {"name": (0.9, 0.001), "city": (0.8, 0.1)}
    agreements = {
        "name": F.col("name_a") == F.col("name_b"),
        "city": F.col("city_a") == F.col("city_b"),
    }
    w = fs_weights(mu)
    # threshold above the best name-disagreeing score → name is necessary
    thr = w["name"][1] + w["city"][0] + 0.5
    base = {
        (r["rec_id_a"], r["rec_id_b"], r["fs_score_micros"])
        for r in fs_score_pairs(recs, ["blk"], agreements, mu, threshold_bits=thr).collect()
    }
    promoted = {
        (r["rec_id_a"], r["rec_id_b"], r["fs_score_micros"])
        for r in fs_score_pairs(
            recs, ["blk"], agreements, mu, threshold_bits=thr,
            equi_agreements={"name": F.col("name")},
        ).collect()
    }
    assert promoted == base and len(base) > 0

    # city is NOT necessary at a low threshold: asking to promote it must be
    # a no-op (pairs disagreeing on city but passing still appear)
    low = w["name"][0] + w["city"][1] - 0.5  # (1,3) passes with city disagreeing
    got = {
        (r["rec_id_a"], r["rec_id_b"])
        for r in fs_score_pairs(
            recs, ["blk"], agreements, mu, threshold_bits=low,
            equi_agreements={"city": F.col("city")},
        ).collect()
    }
    assert (1, 3) in got, "non-necessary field was wrongly promoted to a join key"


def test_pairwise_cluster_metrics_known_answer(spark):
    """Hand-checked: clusters {a,b,c} + {d,e} + singleton f predict pairs
    {ab, ac, bc, de}; truth {ab, ac, df} → hit {ab, ac}: precision 2/4,
    recall 2/3, F1 2·2/(4+3). Empty-denominator guard returns NULL."""
    from repostcheckerbot_spark.operators.er import pairwise_cluster_metrics

    clusters = spark.createDataFrame(
        [("a", "a"), ("b", "a"), ("c", "a"), ("d", "d"), ("e", "d"), ("f", "f")],
        "conv_id string, cluster_id string",
    )
    truth = spark.createDataFrame(
        [("a", "b"), ("a", "c"), ("d", "f")], "id_a string, id_b string"
    )
    row = pairwise_cluster_metrics(clusters, truth).collect()[0]
    assert (row["n_truth"], row["n_pred"], row["n_hit"]) == (3, 4, 2)
    assert row["precision_millionths"] == 500_000
    assert row["recall_millionths"] == 666_666
    assert row["f1_millionths"] == math.floor(2 * 2 * 1_000_000 / 7)

    empty = spark.createDataFrame([], "id_a string, id_b string")
    row0 = pairwise_cluster_metrics(
        spark.createDataFrame([("x", "x")], "conv_id string, cluster_id string"), empty
    ).collect()[0]
    assert row0["n_pred"] == 0 and row0["precision_millionths"] is None
    assert row0["recall_millionths"] is None


def test_bcubed_ari_metrics_known_answer(spark):
    """Hand-checked contingency algebra: pred {a,b,c}+{d,e}+{f}, truth
    {a,b}+{c}+{d,e,f}. Per-record B³ precision = (2/3+2/3+1/3+1+1+1)/6 =
    0.7778; by the example's symmetry recall equals precision; ARI =
    (2−16/15)/(4−16/15) = 0.31818."""
    from repostcheckerbot_spark.operators.er import bcubed_ari_metrics

    pred = spark.createDataFrame(
        [("a", "A"), ("b", "A"), ("c", "A"), ("d", "D"), ("e", "D"), ("f", "F")],
        "conv_id string, cluster_id string",
    )
    truth = spark.createDataFrame(
        [("a", "T1"), ("b", "T1"), ("c", "T2"), ("d", "T3"), ("e", "T3"), ("f", "T3")],
        "conv_id string, cluster_id string",
    )
    row = bcubed_ari_metrics(pred, truth).collect()[0]
    assert row["n_records"] == 6
    # sp = 4e6//3 + 1e6//3 + 4e6//2 + 1e6//1 = 4_666_666 → //6
    assert row["bcubed_precision_millionths"] == 777_777
    assert row["bcubed_recall_millionths"] == 777_777
    assert row["bcubed_f1_millionths"] == 777_777
    # cn2=30 c2=4 r2=8 s2=8 → 2e6·(120−64) // (30·16−128) = 112e6 // 352
    assert row["ari_millionths"] == 318_181

    ident = bcubed_ari_metrics(truth, truth).collect()[0]
    assert ident["bcubed_f1_millionths"] == 1_000_000
    assert ident["ari_millionths"] == 1_000_000


def test_threshold_sweep_known_answer(spark):
    """Scores 10,20,30 with labels T,F,T; thresholds 5/15/25/35. t=5 →
    pred 3 hit 2; t=15 → pred 2 hit 1; t=25 → pred 1 hit 1; t=35 → pred 0
    (absent bins still produce a row). n_truth = 2 throughout."""
    from repostcheckerbot_spark.operators.er import threshold_sweep

    scored = spark.createDataFrame(
        [(10, True), (20, False), (30, True)], "fs_score_micros long, is_true boolean"
    )
    rows = {
        r["threshold"]: r
        for r in threshold_sweep(scored, [5, 15, 25, 35]).collect()
    }
    assert set(rows) == {5, 15, 25, 35}
    assert (rows[5]["n_pred"], rows[5]["n_hit"]) == (3, 2)
    assert rows[5]["precision_millionths"] == 666_666
    assert rows[5]["recall_millionths"] == 1_000_000
    assert rows[5]["f1_millionths"] == 800_000
    assert (rows[15]["n_pred"], rows[15]["n_hit"]) == (2, 1)
    assert (rows[25]["n_pred"], rows[25]["n_hit"]) == (1, 1)
    assert rows[25]["precision_millionths"] == 1_000_000
    assert rows[25]["recall_millionths"] == 500_000
    assert (rows[35]["n_pred"], rows[35]["n_hit"]) == (0, 0)
    assert rows[35]["precision_millionths"] is None
    assert rows[35]["recall_millionths"] == 0


def test_agreement_pattern_counts_null_folding(spark):
    """NULL agreement flags (missing fields) fold into False before grouping
    and colliding patterns accumulate — the EM histogram must conserve the
    total pair count."""
    from repostcheckerbot_spark.operators.er import agreement_pattern_counts

    pairs = spark.createDataFrame(
        [
            (True, True),
            (True, None),   # NULL → folds to (True, False)
            (True, False),  # collides with the folded row → must sum
            (None, None),   # → (False, False)
            (False, False),
        ],
        "agree_x boolean, agree_y boolean",
    )
    counts = agreement_pattern_counts(pairs, ["x", "y"])
    assert counts == {(True, True): 1, (True, False): 2, (False, False): 2}
    assert sum(counts.values()) == 5


# -------------------------------------------------------------- survivorship
def test_golden_records_rules_and_ties(spark):
    df = spark.createDataFrame(
        [
            # cluster A: mode(src) = x (2 vs 1); longest text = 'cccc';
            # doc_id min = 1; n max = 9
            (1, "A", "x", "aa", 3),
            (2, "A", "x", "cccc", 9),
            (3, "A", "y", "bb", 1),
            # cluster B: mode tie x vs y (1 each) → lexicographically smallest 'x';
            # longest tie 'dd' vs 'aa' (len 2) → smallest 'aa'
            (7, "B", "y", "dd", 5),
            (8, "B", "x", "aa", 4),
        ],
        "doc_id long, cl string, src string, txt string, n int",
    )
    out = {
        r["cl"]: r
        for r in golden_records(
            df, "cl", {"doc_id": "min", "src": "mode", "txt": "longest", "n": "max"}
        ).collect()
    }
    assert out["A"]["doc_id"] == 1 and out["A"]["src"] == "x"
    assert out["A"]["txt"] == "cccc" and out["A"]["n"] == 9
    assert out["B"]["src"] == "x"      # tie → lexicographically smallest
    assert out["B"]["txt"] == "aa"     # equal length tie → smallest
    assert out["B"]["doc_id"] == 7 and out["B"]["n"] == 5


def test_golden_records_unknown_rule(spark):
    import pytest

    df = spark.createDataFrame([(1, "A")], "doc_id long, cl string")
    with pytest.raises(ValueError):
        golden_records(df, "cl", {"doc_id": "median"})


# --------------------------------------------------------------- token sort
def test_token_sort_ratio_order_insensitive(spark):
    df = spark.createDataFrame(
        [("the quick brown fox", "fox brown QUICK the", "quick brown dog")],
        "a string, b string, c string",
    )
    row = df.select(
        token_sort_key("a").alias("ka"),
        token_sort_ratio("a", "b").alias("perm"),
        token_sort_ratio("a", "c").alias("diff"),
    ).collect()[0]
    assert row["ka"] == "brown fox quick the"
    assert row["perm"] == 1.0          # permutation + case → identical keys
    assert 0.0 < row["diff"] < 1.0


# -------------------------------------------------------------- tfidf cosine
def test_tfidf_cosine_known_answer(spark):
    """Near-identical docs (one word changed) share most rare bigrams → high
    cosine; an unrelated doc pairs with nobody; a hot bigram present in ALL
    docs is excluded by the DF cap and cannot create pairs on its own."""
    shared = "zz yy "  # bigram 'zz yy' appears in every doc → capped out
    docs = spark.createDataFrame(
        [
            (1, shared + "alpha beta gamma delta epsilon"),
            (2, shared + "alpha beta gamma delta zeta"),
            (3, shared + "one two three four five"),
        ],
        "doc_id long, text string",
    )
    # max_df_frac such that df=3 ('zz yy') is excluded but df<=2 survives:
    # greatest(3*0.67, 0) ≈ 2.01 → need floor 0 → use df floor via frac only
    out = tfidf_cosine_pairs(docs, n=2, min_cosine=0.1, max_df_frac=0.9)
    # with TFIDF_DF_FLOOR=5 every bigram survives on a 3-doc corpus; idf of
    # the universal bigram is ln(1)=0, so it contributes nothing — only the
    # genuinely shared rare bigrams can pair docs.
    rows = {(r["doc_id_a"], r["doc_id_b"]): r["cosine_micros"] for r in out.collect()}
    assert (1, 2) in rows
    # hand-check: 4 shared bigrams at idf ln(3/2), 1 unique each at ln(3),
    # universal 'zz yy' at idf 0 → cos = 4·ln(1.5)²/(4·ln(1.5)²+ln(3)²)
    s, u = math.log(1.5), math.log(3.0)
    exp = math.floor(4 * s * s / (4 * s * s + u * u) * 1_000_000)
    assert abs(rows[(1, 2)] - exp) <= 2  # float-sum-order slack on the floor
    assert (1, 3) not in rows and (2, 3) not in rows


def test_tfidf_cosine_self_similarity_bound(spark):
    """cosine ≤ 1 (micros ≤ 1e6) and symmetric construction emits a<b only."""
    docs = spark.createDataFrame(
        [(i, "w%d x%d common token stream here" % (i % 2, i % 3)) for i in range(8)],
        "doc_id long, text string",
    )
    rows = tfidf_cosine_pairs(docs, n=2, min_cosine=0.0, max_df_frac=1.0).collect()
    assert rows, "expected at least one pair"
    for r in rows:
        assert r["doc_id_a"] < r["doc_id_b"]
        assert r["cosine_micros"] <= 1_000_000


# ---------------------------------------------------------------- phonetic
def test_phonetic_key_canonical_examples(spark):
    """Canonical American-Soundex examples, incl. the h/w collapse rule and
    the same-code-as-first-letter drop."""
    from repostcheckerbot_spark.operators.er import phonetic_key

    cases = {
        "Robert": "R163",
        "Rupert": "R163",
        "ROBERT": "R163",     # case-insensitive
        "Tymczak": "T522",    # CZ same code across the run
        "Pfister": "P236",    # leading PF collapses with the first letter
        "Honeyman": "H555",
        "Honeywell": "H540",
        "Aubrey": "A160",
        "Ashcraft": "A261",   # s-h-c: h transparent, S and C same code → one 2
        "White": "W300",
        "r2-d2": "R300",      # non-letters stripped before keying
        "a": "A000",
        "": None,
        "42": None,           # no letters → NULL
    }
    df = spark.createDataFrame([(w,) for w in cases], "w string")
    got = {r["w"]: r["k"] for r in df.select("w", phonetic_key("w").alias("k")).collect()}
    assert got == cases


# ------------------------------------------------------------------- EM fit
def test_fs_estimate_mu_recovers_planted_parameters():
    """EM on an EXACT expected-count histogram (no sampling noise) from
    known (m, u, p) must recover the parameters closely — pure driver-side
    math, no Spark."""
    from itertools import product

    from repostcheckerbot_spark.operators.er import fs_estimate_mu

    fields = ["name", "city", "phone"]
    m_true = [0.95, 0.85, 0.9]
    u_true = [0.02, 0.2, 0.05]
    p_true = 0.08
    N = 1_000_000
    counts = {}
    for g in product([False, True], repeat=3):
        pm, pu = p_true, 1 - p_true
        for f in range(3):
            pm *= m_true[f] if g[f] else 1 - m_true[f]
            pu *= u_true[f] if g[f] else 1 - u_true[f]
        counts[g] = round(N * (pm + pu))
    mu, p = fs_estimate_mu(counts, fields, iters=300)
    assert abs(p - p_true) < 0.01
    for f, (mt, ut) in zip(fields, zip(m_true, u_true)):
        m_hat, u_hat = mu[f]
        assert abs(m_hat - mt) < 0.03, (f, m_hat, mt)
        assert abs(u_hat - ut) < 0.03, (f, u_hat, ut)


def test_fs_estimate_mu_empty_histogram_raises():
    import pytest

    from repostcheckerbot_spark.operators.er import fs_estimate_mu

    with pytest.raises(ValueError):
        fs_estimate_mu({}, ["a"])


def test_monge_elkan_known_answers(spark):
    """Identical token SETS score 1.0 regardless of order/duplication; the
    directional asymmetry is the textbook one: every token of a subset side
    matches perfectly, the superset side averages in its unmatched token."""
    from repostcheckerbot_spark.operators.er import monge_elkan_millionths

    df = spark.createDataFrame(
        [
            ("alpha beta", "beta  alpha"),
            ("aa", "aa bb"),
            ("aa bb", "aa"),
        ],
        "a string, b string",
    )
    got = [
        r.me
        for r in df.select(monge_elkan_millionths(F.col("a"), F.col("b")).alias("me")).collect()
    ]
    assert got[0] == 1_000_000
    assert got[1] == 1_000_000  # 'aa' finds its exact match in b
    # tokens of a: 'aa'→1.0, 'bb'→jw('bb','aa')=0 ⇒ mean 0.5
    assert got[2] == 500_000


# --------------------------------------------------------- 1:1 assignment
def test_one_to_one_matches_mutual_best_and_ties(spark):
    """A pair survives iff it is top-1 for BOTH endpoints; ties break to the
    smaller partner id; every output id appears at most once per side."""
    from repostcheckerbot_spark.operators.er import one_to_one_matches

    scored = spark.createDataFrame(
        [
            # a1's best is b1 (9) and b1's best is a1 → kept
            (1, 101, 9),
            (1, 102, 5),
            # a2's best is b1 (8) but b1 prefers a1 → a2 unmatched (no cascade)
            (2, 101, 8),
            # a3/b3: tie scores 7 with b4 — smaller partner id wins both ways
            (3, 103, 7),
            (3, 104, 7),
            (4, 103, 7),
        ],
        "rec_id_a long, rec_id_b long, fs_score_micros long",
    )
    got = {
        (r.rec_id_a, r.rec_id_b)
        for r in one_to_one_matches(scored).collect()
    }
    # a3 ties b103/b104 → picks 103; b103 ties a3/a4 → picks 3: mutual
    assert got == {(1, 101), (3, 103)}
    rows = one_to_one_matches(scored).collect()
    assert len({r.rec_id_a for r in rows}) == len(rows)
    assert len({r.rec_id_b for r in rows}) == len(rows)


# ------------------------------------------- term-frequency adjusted weights
def test_tf_value_weights_rarity_monotone():
    """Rarer value ⇒ strictly larger agreement weight; formula is
    log2(m·N/n_v) exactly."""
    from repostcheckerbot_spark.operators.er import tf_value_weights

    w = tf_value_weights({"common": 900, "rare": 100}, 1000, m=0.9)
    assert w["rare"] > w["common"]
    assert abs(w["rare"] - math.log2(0.9 * 1000 / 100)) < 1e-12
    assert abs(w["common"] - math.log2(0.9 * 1000 / 900)) < 1e-12


def test_collect_value_histogram_cap_raises(spark):
    from pytest import raises

    from repostcheckerbot_spark.operators.er import collect_value_histogram

    df = spark.range(100).select(F.col("id").cast("string").alias("v"))
    with raises(ValueError):
        collect_value_histogram(df, "v", max_distinct=10)
    counts, total = collect_value_histogram(df, "v", max_distinct=100)
    assert total == 100 and len(counts) == 100


def test_fs_tf_score_pairs_value_specific_weights(spark):
    """Agreement on the RARE value outscores agreement on the common one;
    disagreement uses the constant baseline weight."""
    from repostcheckerbot_spark.operators.er import (
        fs_tf_score_pairs,
        fs_weights,
        tf_value_weights,
    )

    recs = spark.createDataFrame(
        [
            (1, 0, "x", "rare"),
            (2, 0, "x", "rare"),
            (3, 0, "x", "common"),
            (4, 0, "x", "common"),
            (5, 0, "x", "common"),
            (6, 0, "x", "common"),
            (7, 0, "y", "common"),
            (8, 0, "y", "other"),
        ],
        "rec_id long, blk int, f string, seg string",
    )
    mu = {"f": (0.9, 0.1), "seg": (0.9, 0.2)}
    out = fs_tf_score_pairs(
        recs,
        ["blk"],
        {"f": F.col("f_a") == F.col("f_b")},
        mu,
        tf_field="seg",
    ).collect()
    by_pair = {(r.rec_id_a, r.rec_id_b): r.fs_score_micros for r in out}
    w = fs_weights(mu)
    tfw = tf_value_weights({"rare": 2, "common": 5, "other": 1}, 8, 0.9)
    exp_rare = math.floor((w["f"][0] + tfw["rare"]) * 1_000_000)
    exp_common = math.floor((w["f"][0] + tfw["common"]) * 1_000_000)
    exp_dis = math.floor((w["f"][0] + w["seg"][1]) * 1_000_000)
    assert by_pair[(1, 2)] == exp_rare
    assert by_pair[(3, 4)] == exp_common
    assert exp_rare > exp_common
    assert by_pair[(1, 3)] == exp_dis  # seg disagrees → constant baseline
    # the agree flag is present and correct
    flags = {(r.rec_id_a, r.rec_id_b): r.agree_seg for r in out}
    assert flags[(1, 2)] is True and flags[(1, 3)] is False


# ----------------------------------------------------- deterministic cascade
def test_rule_cascade_first_rule_wins(spark):
    """Pairs matched by several rules carry the FIRST (lowest-index) rule;
    null keys never pair; cross-block pairs never meet."""
    from repostcheckerbot_spark.operators.er import rule_cascade

    recs = spark.createDataFrame(
        [
            (1, 0, "ann", "k1"),
            (2, 0, "ann", "k1"),   # rules 0 AND 1 → attributed to 0
            (3, 0, "bob", "k1"),   # rule 1 only (with 1, 2)
            (4, 0, None, "zz"),    # null rule-0 key → only rule 1 can pair it
            (5, 0, None, "zz"),
            (6, 1, "ann", "k1"),   # other block — never paired
        ],
        "rec_id long, blk int, name string, code string",
    )
    out = rule_cascade(
        recs,
        [("by_name", F.col("name")), ("by_code", F.col("code"))],
        block_cols=["blk"],
    ).collect()
    got = {(r.id_a, r.id_b): (r.rule_idx, r.rule) for r in out}
    assert got[(1, 2)] == (0, "by_name")
    assert got[(1, 3)] == (1, "by_code")
    assert got[(2, 3)] == (1, "by_code")
    assert got[(4, 5)] == (1, "by_code")
    assert all(6 not in pair for pair in got)
    assert len(got) == 4


def test_uncertainty_queue_prefilter_lossless_and_deterministic(spark):
    """The per-block prefilter must not change the global top-k (losslessness:
    each block contributes at most k rows, and the global winners are within
    their block's top-k by definition); ranks are contiguous and ties at the
    boundary break on ids."""
    import random as _random

    from repostcheckerbot_spark.operators.er import uncertainty_queue

    rng = _random.Random(3)
    rows = [
        (i * 2, i * 2 + 1, rng.randrange(5), rng.randrange(0, 10_000_000))
        for i in range(400)
    ]
    # planted exact ties straddling the threshold
    rows += [(9000, 9001, 9, 5_000_100), (9002, 9003, 9, 4_999_900)]
    scored = spark.createDataFrame(
        rows, "rec_id_a long, rec_id_b long, nat int, fs_score_micros long"
    )
    blocked = uncertainty_queue(scored, 5_000_000, 25, block_cols=["nat"]).collect()
    plain = uncertainty_queue(scored, 5_000_000, 25, block_cols=None).collect()
    assert [tuple(r) for r in blocked] == [tuple(r) for r in plain]
    assert [r.rank for r in blocked] == list(range(1, 26))
    # the two planted ±100 pairs tie on uncertainty; id order decides
    top2 = [(r.rec_id_a, r.uncertainty_micros) for r in blocked[:2]]
    assert top2 == [(9000, 100), (9002, 100)]


def test_blocking_scheme_report_known_answer(spark):
    """Cost from block sizes, completeness against truth, NULL keys block
    nothing, degenerate one-block scheme shows quadratic cost with perfect
    completeness."""
    from pyspark.sql import functions as F

    from repostcheckerbot_spark.operators.er import blocking_scheme_report

    recs = spark.createDataFrame(
        [
            (0, "x", "ann"), (1, "x", "ann"),      # truth pair, same city
            (2, "y", "bob"), (3, "x", "bob"),      # truth pair, split cities
            (4, None, "eve"), (5, None, "eve"),    # truth pair, NULL city
        ],
        ["rec_id", "city", "name"],
    )
    truth = recs.where(F.col("rec_id") % 2 == 0).select(
        F.col("rec_id").alias("id_a"), (F.col("rec_id") + 1).alias("id_b")
    )
    got = {
        r.scheme: (r.n_blocks, r.n_candidate_pairs, r.n_truth_covered, r.completeness_micros)
        for r in blocking_scheme_report(
            recs,
            {"city": F.col("city"), "name": F.col("name"), "all": F.lit(1)},
            truth,
        ).collect()
    }
    assert got == {
        # city: blocks x={0,1,3} (3 pairs), y={2} (0); NULL rows 4,5 excluded;
        # covers only (0,1) → 1/3
        "city": (2, 3, 1, 333333),
        # name: three blocks of 2, covers all three pairs
        "name": (3, 3, 3, 1000000),
        # degenerate: one block of 6 → C(6,2)=15 pairs, perfect completeness
        "all": (1, 15, 3, 1000000),
    }


def test_capture_recapture_estimate(spark):
    from repostcheckerbot_spark.operators.er import capture_recapture_estimate

    def pairs(rows):
        return spark.createDataFrame(rows, "doc_id_a long, doc_id_b long")

    # channel A catches 4 pairs, B catches 3, overlap 2
    # Chapman: (4+1)(3+1)//(2+1) - 1 = 20//3 - 1 = 5
    a = pairs([(1, 2), (3, 4), (5, 6), (7, 8), (1, 2)])  # dup row collapses
    b = pairs([(1, 2), (3, 4), (9, 10)])
    [r] = capture_recapture_estimate(a, b).collect()
    assert (r.n_a, r.n_b, r.n_overlap, r.n_est_total) == (4, 3, 2, 5)

    # disjoint channels: m = 0 stays defined -> (3+1)(1+1)//1 - 1 = 7
    [r0] = capture_recapture_estimate(pairs([(1, 2), (3, 4), (5, 6)]), pairs([(7, 8)])).collect()
    assert (r0.n_a, r0.n_b, r0.n_overlap, r0.n_est_total) == (3, 1, 0, 7)

    # identical channels: estimate collapses to the observed count
    # (4+1)(4+1)//(4+1) - 1 = 4
    same = [(1, 2), (3, 4), (5, 6), (7, 8)]
    [r1] = capture_recapture_estimate(pairs(same), pairs(same)).collect()
    assert (r1.n_a, r1.n_b, r1.n_overlap, r1.n_est_total) == (4, 4, 4, 4)
