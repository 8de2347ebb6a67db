"""Text-analysis operators for a training-data pipeline over ``documents``.

All native Catalyst expressions (whole-stage codegen; no Python), designed so
a DuckDB oracle can state the identical formula:

- token_count       — whitespace tokenization + a BPE-ish sub-token regex count
- quality_score     — length / punctuation / stopword-ratio heuristics
- gopher_flags      — published Gopher-style per-doc quality filter rules
- lang_id           — stopword-hit heuristic (deterministic n-gram-free v1)
- doc_fingerprint   — min-md5 shingle fingerprint (rolling-hash analog with a
                      portable hash so the oracle can reproduce it)
- redact_pii        — email / IPv4 / phone redaction with per-class counts
- top_ngrams        — corpus-level top-k word n-grams by document frequency

Regex patterns are kept inside the (large) dialect intersection of Java
regex (Spark) and RE2 (DuckDB): character classes, ``\\b``, bounded repeats —
no backreferences or lookaround.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

#: tiny English stopword list — deterministic, shared verbatim with the oracle.
STOPWORDS = ("the", "a", "and", "of", "to", "in", "is", "it", "for", "on")

#: BPE-ish sub-token pattern: runs of letters, runs of digits, or single
#: non-alphanumeric non-space symbols.
SUBTOKEN_RE = r"[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\s]"


def with_token_stats(docs: DataFrame, text_col: str = "text") -> DataFrame:
    t = F.col(text_col)
    ws_tokens = F.split(F.trim(t), r"\s+")
    return docs.withColumn(
        "n_ws_tokens", F.when(F.length(F.trim(t)) == 0, 0).otherwise(F.size(ws_tokens))
    ).withColumn("n_subtokens", F.size(F.regexp_extract_all(t, F.lit(SUBTOKEN_RE), F.lit(0))))


def quality_score(text_col: Column) -> Column:
    """Heuristic score, reported as integer MILLIONTHS of [0,1]: longer docs,
    moderate punctuation, healthy stopword ratio score higher. Formula is
    arbitrary but FROZEN (oracle-shared):

      0.4·min(n_chars/500, 1) + 0.3·(1 - punct_ratio) + 0.3·min(stop_ratio·5, 1)

    floor(score·1e6) instead of round(score, 6): both engines compute the
    identical IEEE double, but their ROUND decimal conversions differ at
    half-boundaries; floor on the same double is engine-independent.
    """
    n_chars = F.length(text_col)
    n_punct = F.size(F.regexp_extract_all(text_col, F.lit(r"[^a-zA-Z0-9\s]"), F.lit(0)))
    words = F.split(F.lower(F.trim(text_col)), r"\s+")
    n_words = F.size(words)
    n_stop = F.size(F.filter(words, lambda w: w.isin(*STOPWORDS)))
    punct_ratio = F.when(n_chars > 0, n_punct / n_chars).otherwise(F.lit(0.0))
    stop_ratio = F.when(n_words > 0, n_stop / n_words).otherwise(F.lit(0.0))
    score = (
        0.4 * F.least(n_chars / F.lit(500.0), F.lit(1.0))
        + 0.3 * (F.lit(1.0) - punct_ratio)
        + 0.3 * F.least(stop_ratio * 5.0, F.lit(1.0))
    )
    return F.floor(score * 1000000).cast("long")


def lang_id(text_col: Column) -> Column:
    """'en' when ≥8% of whitespace tokens are English stopwords, else 'unk'."""
    words = F.split(F.lower(F.trim(text_col)), r"\s+")
    n_words = F.size(words)
    n_stop = F.size(F.filter(words, lambda w: w.isin(*STOPWORDS)))
    ratio = F.when(n_words > 0, n_stop / n_words).otherwise(F.lit(0.0))
    return F.when(ratio >= 0.08, F.lit("en")).otherwise(F.lit("unk"))


#: PII patterns — dialect-portable (Java regex ∩ RE2, see module docstring).
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
IPV4_RE = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"
PHONE_RE = r"\b\d{3}-\d{3}-\d{4}\b"


def redact_pii(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Scrub emails, IPv4 addresses, and NNN-NNN-NNNN phone numbers — the
    standard pre-training privacy pass. Adds ``n_emails / n_ips / n_phones``
    and ``redacted`` (the scrubbed text). All JVM-side regexp ops.

    Classes are counted and replaced SEQUENTIALLY (emails → IPs → phones),
    each on the output of the previous replacement: an address inside an
    email's local part (``10.1.2.3@host``) counts as email, not IP — the
    counts partition the matches instead of double-counting overlaps, and
    the sequence is trivially mirrored by an oracle.
    """
    emails_gone = F.regexp_replace(F.col(text_col), EMAIL_RE, "[EMAIL]")
    ips_gone = F.regexp_replace(emails_gone, IPV4_RE, "[IP]")
    all_gone = F.regexp_replace(ips_gone, PHONE_RE, "[PHONE]")
    return (
        docs.withColumn("n_emails", F.regexp_count(F.col(text_col), F.lit(EMAIL_RE)))
        .withColumn("n_ips", F.regexp_count(emails_gone, F.lit(IPV4_RE)))
        .withColumn("n_phones", F.regexp_count(ips_gone, F.lit(PHONE_RE)))
        .withColumn("redacted", all_gone)
    )


def gopher_flags(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-document quality-filter flags in the style of the published Gopher
    rules (Rae et al. 2021, §A1.1 — public paper): word-count bounds, mean
    word length bounds, minimum alphabetic-word fraction. Thresholds follow
    the paper; the 50-word floor also matches C4's short-doc drop.

    Ratio columns are integer MILLIONTHS (floor·1e6 — same engine-portable
    convention as :func:`quality_score`). Flags are plain booleans so the
    downstream keep/drop filter is one ANDed predicate at the scan.
    """
    t = F.col(text_col)
    words = F.split(F.lower(F.trim(t)), r"\s+")
    n_words = F.when(F.length(F.trim(t)) == 0, F.lit(0)).otherwise(F.size(words)).cast("long")
    total_chars = F.aggregate(words, F.lit(0).cast("long"), lambda acc, w: acc + F.length(w))
    mean_wlen_micros = F.when(
        n_words > 0, F.floor(total_chars / n_words * 1000000)
    ).otherwise(F.lit(0)).cast("long")
    n_alpha = F.size(F.filter(words, lambda w: w.rlike("[a-z]")))
    alpha_frac_micros = F.when(
        n_words > 0, F.floor(n_alpha / n_words * 1000000)
    ).otherwise(F.lit(0)).cast("long")
    pass_nw = (n_words >= 50) & (n_words <= 100_000)
    pass_wl = (mean_wlen_micros >= 3_000_000) & (mean_wlen_micros <= 10_000_000)
    pass_af = alpha_frac_micros >= 800_000
    return (
        docs.withColumn("n_words", n_words)
        .withColumn("mean_word_len_micros", mean_wlen_micros)
        .withColumn("alpha_frac_micros", alpha_frac_micros)
        .withColumn("pass_word_count", pass_nw)
        .withColumn("pass_word_len", pass_wl)
        .withColumn("pass_alpha", pass_af)
        .withColumn("pass_gopher", pass_nw & pass_wl & pass_af)
    )


def top_ngrams(docs: DataFrame, n: int = 3, k: int = 20, text_col: str = "text") -> DataFrame:
    """Top-``k`` word ``n``-grams by DOCUMENT frequency (each doc counts an
    n-gram once) — the corpus-statistics pass behind boilerplate detection.

    Shape at scale: the n-gram explode is narrow (scan-side), the only wide
    ops are one distinct + one groupBy on the n-gram, and the final top-k is
    sort+limit (``TakeOrderedAndProject`` — per-partition heaps merged on the
    driver, never a global sort), with the rank window applied to the k
    surviving rows only. Ties break lexicographically for determinism.
    """
    ngram = F.concat_ws(" ", *[F.element_at(F.col("_w"), F.lit(i + 1)) for i in range(n)])
    grams = (
        docs.select(F.split(F.lower(F.trim(F.col(text_col))), r"\s+").alias("_w0"), "*")
        .where(F.size("_w0") >= n)
        .select(
            F.col("doc_id"),
            F.explode(
                F.transform(
                    F.sequence(F.lit(0), F.size("_w0") - n),
                    lambda i: F.slice(F.col("_w0"), i + 1, n),
                )
            ).alias("_w"),
        )
        .select("doc_id", ngram.alias("ngram"))
        .distinct()
    )
    counted = grams.groupBy("ngram").agg(F.count(F.lit(1)).alias("df"))
    topk = counted.orderBy(F.desc("df"), F.asc("ngram")).limit(k)
    w = Window.orderBy(F.desc("df"), F.asc("ngram"))
    return topk.select("ngram", "df", F.row_number().over(w).cast("int").alias("rnk"))


def repetition_stats(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Within-document repetition (the Gopher duplicate-n-gram rule family):
    the fraction of word bigrams that are repeats of an earlier bigram in the
    same doc, as integer millionths. ``pass_repetition`` fails docs whose
    bigram duplicate fraction exceeds 15% — boilerplate/spam signature.

    Narrow per-row expression (no shuffle at all): the bigram list, its
    distinct count, and the ratio all evaluate scan-side in codegen.
    """
    t = F.col(text_col)
    words = F.split(F.lower(F.trim(t)), r"\s+")
    grams = F.when(
        (F.length(F.trim(t)) > 0) & (F.size(words) >= 2),
        F.transform(
            F.sequence(F.lit(0), F.size(words) - 2),
            lambda i: F.concat_ws(" ", F.element_at(words, i + 1), F.element_at(words, i + 2)),
        ),
    ).otherwise(F.array().cast("array<string>"))
    n_grams = F.size(grams).cast("long")
    n_distinct = F.size(F.array_distinct(grams)).cast("long")
    dup_frac_micros = F.when(
        n_grams > 0, F.floor((n_grams - n_distinct) / n_grams * 1000000)
    ).otherwise(F.lit(0)).cast("long")
    return (
        docs.withColumn("n_bigrams", n_grams)
        .withColumn("dup_bigram_frac_micros", dup_frac_micros)
        .withColumn("pass_repetition", dup_frac_micros <= 150_000)
    )


def curate_corpus(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """The end-to-end keep-list a pre-training curation pass produces —
    placeholder drop → Gopher quality gates → repetition gate → language
    gate → exact dedup keep-first AMONG THE SURVIVORS (the keeper is the min
    doc_id of each content group inside the retained pool, so a kept doc is
    never a duplicate of another kept doc).

    Filter order is part of the contract (mirrored verbatim by the oracle):
    row-local gates run first — they are scan-side narrow and shrink the
    dedup's shuffle input — and the only wide ops are the dedup groupBy +
    keeper semi-join. Returns the kept rows with their stats columns.
    """
    from repostcheckerbot_spark.operators import dedup_docs

    gated = (
        repetition_stats(gopher_flags(docs, text_col), text_col)
        .where(F.col(text_col).isNotNull())
        .where(~F.col(text_col).isin("&#x200B;", "", "[removed]", "[deleted]"))
        .where(F.col("pass_gopher") & F.col("pass_repetition"))
        .where(lang_id(F.col(text_col)) == "en")
    )
    ranked = dedup_docs.normalized(gated, text_col).withColumn("content_md5", F.md5("norm_text"))
    keepers = ranked.groupBy("content_md5").agg(F.min("doc_id").alias("doc_id"))
    return (
        ranked.join(keepers, ["content_md5", "doc_id"], "left_semi")
        .select("doc_id", "n_words", "mean_word_len_micros", "alpha_frac_micros", "dup_bigram_frac_micros")
    )


def chunk_documents(docs: DataFrame, max_tokens: int = 64, text_col: str = "text") -> DataFrame:
    """Split every document into context-window chunks of ≤ ``max_tokens``
    whitespace tokens: (doc_id, chunk_idx, chunk_text, n_tokens). The
    sequence-length preprocessing step before training — each doc chunks
    independently (narrow, scan-side, no sequential cross-doc dependency, so
    it parallelizes embarrassingly where greedy cross-doc packing would not).

    Chunk boundaries are token-aligned: chunk i takes tokens
    [i·max_tokens, (i+1)·max_tokens) of the doc in order, re-joined with
    single spaces (original runs of whitespace are not preserved — the
    normalization tokenizers apply anyway).
    """
    words = F.split(F.trim(F.col(text_col)), r"\s+")
    chunks = F.when(
        F.length(F.trim(F.col(text_col))) == 0, F.array().cast("array<array<string>>")
    ).otherwise(
        F.transform(
            F.sequence(F.lit(0), F.ceil(F.size(words) / max_tokens).cast("int") - 1),
            lambda i: F.slice(words, i * max_tokens + 1, max_tokens),
        )
    )
    return (
        docs.select("doc_id", F.posexplode(chunks).alias("chunk_idx", "_toks"))
        .select(
            "doc_id",
            F.col("chunk_idx").cast("int").alias("chunk_idx"),
            F.concat_ws(" ", F.col("_toks")).alias("chunk_text"),
            F.size("_toks").cast("int").alias("n_tokens"),
        )
    )


def dataset_split(docs: DataFrame, val_pct: int = 5, test_pct: int = 5) -> DataFrame:
    """Deterministic train/val/test assignment: bucket 0-99 from the first 8
    hex digits of md5(doc_id) — stable across runs, machines, and engines
    (md5 is the portable hash; the reshuffle-free split every data pipeline
    needs so a doc never migrates between splits when the corpus grows).

    test = buckets [0, test_pct), val = [test_pct, test_pct+val_pct),
    train = the rest.
    """
    bucket = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10).cast("long")
        % 100
    )
    return docs.withColumn("split_bucket", bucket.cast("int")).withColumn(
        "split",
        F.when(F.col("split_bucket") < test_pct, "test")
        .when(F.col("split_bucket") < test_pct + val_pct, "val")
        .otherwise("train"),
    )


def doc_fingerprint(text_col: Column, k: int = 8) -> Column:
    """Deterministic document fingerprint: the minimum md5 over all k-char
    shingles of the whitespace-stripped text (min-wise sketch of size 1 — the
    portable cousin of a rolling-hash winnowing fingerprint)."""
    norm = F.translate(text_col, " \t\n\x0b\f\r", "")  # ≡ regexp_replace(\s+,'')
    expr = (
        f"array_min(transform(sequence(1, greatest(length(_n) - {k - 1}, 1)),"
        f" i -> md5(substring(_n, i, {k}))))"
    )
    # F.expr can't see the local `norm` column; inline it via a struct trick
    return F.aggregate(
        F.transform(
            F.sequence(F.lit(1), F.greatest(F.length(norm) - (k - 1), F.lit(1))),
            lambda i: F.md5(norm.substr(i, F.lit(k))),
        ),
        F.lit("ffffffffffffffffffffffffffffffff"),
        lambda acc, x: F.least(acc, x),
    )
