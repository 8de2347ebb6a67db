"""Unit tests for the round-3 training-pipeline additions: as-of join,
PII redaction, Gopher quality flags, corpus top-ngrams."""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import functions as F

from repostcheckerbot_spark.operators import textstats
from repostcheckerbot_spark.operators.timeseries import asof_join


def _t(s):
    return datetime(2024, 1, 1, 0, 0, s)


def test_asof_join_known_answer(spark):
    """Hand-checked fixture: latest view at-or-before each click, per user;
    clicks with no preceding view get NULL; same-ts view IS visible."""
    clicks = spark.createDataFrame(
        [
            (100, 1, _t(10)),  # after v@5 → sees v5
            (101, 1, _t(3)),   # before any view → NULL
            (102, 1, _t(20)),  # after v@5, v@15 → sees v15
            (103, 2, _t(7)),   # exactly at v@7 → at-or-before includes it
            (104, 3, _t(9)),   # user with no views at all → NULL
        ],
        "event_id long, user_id long, ts timestamp",
    ).withColumn("value", F.col("event_id") * 1.0)
    views = spark.createDataFrame(
        [
            (50, 1, _t(5)),
            (51, 1, _t(15)),
            (52, 2, _t(7)),
        ],
        "event_id long, user_id long, ts timestamp",
    ).withColumn("value", F.col("event_id") * 1.0)

    out = asof_join(
        clicks, views, keys=["user_id"], left_ts="ts", right_ts="ts",
        payload_cols=["ts", "value"], suffix="_v", order_col="event_id",
    )
    got = {r.event_id: (r.ts_v, r.value_v) for r in out.collect()}
    assert len(got) == 5
    assert got[100] == (_t(5), 50.0)
    assert got[101] == (None, None)
    assert got[102] == (_t(15), 51.0)
    assert got[103] == (_t(7), 52.0)   # at-or-before: same-ts view visible
    assert got[104] == (None, None)


def test_asof_join_right_ts_tie_is_deterministic(spark):
    """Two right rows sharing (key, ts): the largest order_col wins — the
    result must not depend on partitioning."""
    clicks = spark.createDataFrame([(9, 1, _t(10), 0.0)], "event_id long, user_id long, ts timestamp, value double")
    views = spark.createDataFrame(
        [(1, 1, _t(5), 11.0), (2, 1, _t(5), 22.0)],
        "event_id long, user_id long, ts timestamp, value double",
    )
    for reps in (1, 8):
        out = asof_join(
            clicks, views.repartition(reps), keys=["user_id"], left_ts="ts",
            right_ts="ts", payload_cols=["value"], suffix="_v", order_col="event_id",
        )
        assert out.collect()[0].value_v == 22.0


def test_asof_join_plan_is_single_window_no_pair_join(spark):
    """The scale contract: ONE shuffle on the keys, no join operator at all —
    the naive theta-join shape (BNLJ / cartesian per key) must not appear."""
    e = spark.range(1000).select(
        F.col("id").alias("event_id"),
        (F.col("id") % 10).alias("user_id"),
        F.timestamp_seconds(F.col("id") * 60).alias("ts"),
        (F.col("id") * 1.0).alias("value"),
    )
    out = asof_join(
        e.where(F.col("event_id") % 2 == 0), e.where(F.col("event_id") % 2 == 1),
        keys=["user_id"], left_ts="ts", right_ts="ts",
        payload_cols=["value"], order_col="event_id",
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    for bad in ("BroadcastNestedLoopJoin", "CartesianProduct", "SortMergeJoin", "BroadcastHashJoin"):
        assert bad not in plan, f"asof_join plans {bad}"
    assert plan.count("Exchange hashpartitioning") == 1  # union feeds ONE shuffle
    assert "Window" in plan


def test_redact_pii_counts_and_overlap_precedence(spark):
    d = spark.createDataFrame(
        [
            (1, "mail bob.smith+x@corp.example.org now"),
            (2, "host 192.168.0.1 and 10.0.0.255 up"),
            (3, "call 555-123-4567 thanks"),
            (4, "ip-in-email 10.1.2.3@host.com stays one email"),
            (5, "clean text with nothing sensitive"),
        ],
        "doc_id long, text string",
    )
    r = {x.doc_id: x for x in textstats.redact_pii(d).collect()}
    assert (r[1].n_emails, r[1].redacted) == (1, "mail [EMAIL] now")
    assert (r[2].n_ips, r[2].redacted) == (2, "host [IP] and [IP] up")
    assert (r[3].n_phones, r[3].redacted) == (1, "call [PHONE] thanks")
    # sequential precedence: the address inside the email is email, not IP
    assert (r[4].n_emails, r[4].n_ips) == (1, 0)
    assert r[4].redacted == "ip-in-email [EMAIL] stays one email"
    assert (r[5].n_emails, r[5].n_ips, r[5].n_phones) == (0, 0, 0)
    assert r[5].redacted == r[5].text


def test_gopher_flags_thresholds(spark):
    long_ok = " ".join(["word"] * 60)                  # 60 words, mwl 4, alpha 1.0
    too_short = "only three words"
    weird_len = " ".join(["ab"] * 80)                  # mwl 2 < 3 → fails word_len
    numeric = " ".join(["123"] * 80)                   # alpha frac 0 → fails alpha
    d = spark.createDataFrame(
        [(1, long_ok), (2, too_short), (3, weird_len), (4, numeric), (5, "")],
        "doc_id long, text string",
    )
    r = {x.doc_id: x for x in textstats.gopher_flags(d).collect()}
    assert r[1].pass_gopher and r[1].n_words == 60 and r[1].mean_word_len_micros == 4_000_000
    assert not r[2].pass_word_count and r[2].pass_word_len
    assert not r[3].pass_word_len and r[3].pass_word_count
    assert not r[4].pass_alpha and r[4].alpha_frac_micros == 0
    assert r[5].n_words == 0 and not r[5].pass_gopher


def test_repetition_stats_flags_boilerplate(spark):
    spam = " ".join(["buy now"] * 30)          # bigram dup frac ≫ 15%
    clean = " ".join(f"w{i}" for i in range(30))
    d = spark.createDataFrame(
        [(1, spam), (2, clean), (3, "single"), (4, "")],
        "doc_id long, text string",
    )
    r = {x.doc_id: x for x in textstats.repetition_stats(d).collect()}
    assert not r[1].pass_repetition and r[1].dup_bigram_frac_micros > 900_000
    assert r[2].pass_repetition and r[2].dup_bigram_frac_micros == 0
    assert r[3].n_bigrams == 0 and r[3].pass_repetition  # < 2 words: vacuous pass
    assert r[4].n_bigrams == 0


def test_curate_corpus_gates_and_dedup(spark):
    # passes every gate: 60 words, mean word len ≈ 6.3 ∈ [3,10], all-alpha,
    # unique bigrams, stopword ratio 10/60 ≈ 17% ≥ 8%
    good = " ".join("the" if i % 6 == 0 else f"alpha{i}" for i in range(60))
    d = spark.createDataFrame(
        [
            (1, good),
            (2, good),                        # exact dup of 1 → dropped (keep-first)
            (3, "[removed]"),                 # placeholder
            (4, " ".join(["buy now"] * 40)),  # repetition gate
            (5, "too short"),                 # word-count gate
        ],
        "doc_id long, text string",
    )
    kept = textstats.curate_corpus(d).collect()
    assert [r.doc_id for r in kept] == [1]
    assert kept[0].n_words >= 50 and kept[0].dup_bigram_frac_micros <= 150_000


def test_chunk_documents_boundaries(spark):
    d = spark.createDataFrame(
        [
            (1, " ".join(f"t{i}" for i in range(10))),  # 10 tokens, max 4 → 4+4+2
            (2, "one two"),                              # single short chunk
            (3, ""),                                     # no chunks at all
        ],
        "doc_id long, text string",
    )
    rows = textstats.chunk_documents(d, max_tokens=4).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r)
    c1 = sorted(by_doc[1], key=lambda r: r.chunk_idx)
    assert [r.n_tokens for r in c1] == [4, 4, 2]
    assert c1[0].chunk_text == "t0 t1 t2 t3" and c1[2].chunk_text == "t8 t9"
    # tokens survive chunking in order, nothing dropped or duplicated
    assert " ".join(r.chunk_text for r in c1) == d.collect()[0].text
    assert by_doc[2][0].chunk_text == "one two"
    assert 3 not in by_doc


def test_dataset_split_is_stable_and_disjoint(spark):
    d = spark.range(2000).select(F.col("id").alias("doc_id"))
    s1 = {r.doc_id: r.split for r in textstats.dataset_split(d).collect()}
    s2 = {r.doc_id: r.split for r in textstats.dataset_split(d.repartition(7)).collect()}
    assert s1 == s2  # partitioning-independent assignment
    from collections import Counter

    c = Counter(s1.values())
    assert set(c) == {"train", "val", "test"}
    # md5 buckets ≈ uniform: 90/5/5 within generous tolerance
    assert 0.85 <= c["train"] / 2000 <= 0.95
    assert 0.02 <= c["val"] / 2000 <= 0.09
    assert 0.02 <= c["test"] / 2000 <= 0.09
    # growing the corpus never migrates an existing doc between splits
    grown = {r.doc_id: r.split for r in textstats.dataset_split(
        spark.range(4000).select(F.col("id").alias("doc_id"))).collect()}
    assert all(grown[k] == v for k, v in s1.items())


def test_top_ngrams_df_counts_docs_once(spark):
    # "a b c" twice within doc 1 → still df 1; across docs 1,2 → df 2
    d = spark.createDataFrame(
        [
            (1, "a b c x a b c"),
            (2, "a b c y"),
            (3, "z z z"),
            (4, "q w"),  # < 3 words → contributes nothing
        ],
        "doc_id long, text string",
    )
    rows = textstats.top_ngrams(d, n=3, k=3).collect()
    assert [(r.ngram, r.df, r.rnk) for r in rows][0] == ("a b c", 2, 1)
    assert all(r.df >= 1 for r in rows) and len(rows) == 3
    # ties broken lexicographically
    assert [r.rnk for r in rows] == [1, 2, 3]


def test_sessionize_known_answer(spark):
    """30-min gap sessionization: breaks strictly-greater gaps, per key,
    ties broken by order_col; session_idx is 1-based and contiguous."""
    from datetime import datetime as dt

    from repostcheckerbot_spark.operators.timeseries import sessionize

    rows = [
        # user 1: events at 0s, 100s, exactly gap later (no break), gap+1 (break)
        (1, 1, dt(2024, 1, 1, 0, 0, 0)),
        (2, 1, dt(2024, 1, 1, 0, 1, 40)),
        (3, 1, dt(2024, 1, 1, 0, 31, 40)),   # 1800s after #2 → same session
        (4, 1, dt(2024, 1, 1, 1, 1, 41)),    # 1801s after #3 → new session
        # user 2: single event
        (9, 2, dt(2024, 1, 1, 5, 0, 0)),
    ]
    e = spark.createDataFrame(rows, "event_id long, user_id long, ts timestamp")
    out = {
        r["event_id"]: r["session_idx"]
        for r in sessionize(e, keys=["user_id"], gap_seconds=1800, order_col="event_id").collect()
    }
    assert out == {1: 1, 2: 1, 3: 1, 4: 2, 9: 1}


def test_sessionize_single_window_plan(spark):
    """lag + running-sum share one shuffle: exactly ONE Exchange in the plan."""
    from repostcheckerbot_spark.operators.timeseries import sessionize
    from repostcheckerbot_spark.sources.testdata import load

    e = load(spark, "/root/testdata/sf0.001", "events")
    plan = (
        sessionize(e, keys=["user_id"], order_col="event_id")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("Exchange") == 1, plan
