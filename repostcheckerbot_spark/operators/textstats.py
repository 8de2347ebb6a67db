"""Text-analysis operators for a training-data pipeline over ``documents``.

All native Catalyst expressions (whole-stage codegen; no Python), designed so
a DuckDB oracle can state the identical formula:

- token_count       — whitespace tokenization + a BPE-ish sub-token regex count
- quality_score     — length / punctuation / stopword-ratio heuristics
- lang_id           — stopword-hit heuristic (deterministic n-gram-free v1)
- doc_fingerprint   — min-md5 shingle fingerprint (rolling-hash analog with a
                      portable hash so the oracle can reproduce it)
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
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
