"""Corpus-level curation operators: decontamination, sequence packing,
stratified sampling / domain mixing, and BM25 keyword retrieval.

These are the remaining table-stakes passes of a large-scale training-data
pipeline (beyond the per-doc stats in :mod:`textstats` and the dedup family
in :mod:`dedup_docs`):

- ``decontaminate``     — benchmark decontamination: flag training documents
                          sharing any word ``n``-gram with a held-out
                          evaluation set (the standard pre-training hygiene
                          pass; e.g. GPT-3 App. C / PaLM §D — public papers).
- ``pack_manifest``     — concat-and-chop sequence packing: the doc→context-
                          window assignment map produced when the token
                          stream of each shard is chopped into fixed-size
                          training sequences.
- ``stratified_sample`` — deterministic per-stratum hash sampling (md5
                          bucket < rate), stable under corpus growth and
                          repartitioning — the sampling analog of
                          :func:`textstats.dataset_split`.
- ``mix_domains``       — water-filling solve of per-domain sampling rates
                          that hit a token/doc budget at target domain
                          weights, then the same deterministic hash sample.
- ``bm25_scores``       — Okapi BM25 (Robertson/Sparck Jones — public
                          formula) of every document against a small query
                          term set, all JVM-side.

Scale notes (100 TB):

- decontamination joins the exploded train n-grams against the BENCHMARK
  n-gram set, which is tiny by construction (eval suites are MBs, not TBs) —
  always broadcast; the train side stays narrow until one groupBy(doc_id).
- packing's only wide op is one cumulative-sum window PARTITIONED BY SHARD;
  shard count is a parameter precisely so each partition's stream fits an
  executor (a global unpartitioned cumsum would serialize the corpus).
  Per-shard packing is also what a real distributed writer produces anyway —
  each output shard is an independent token stream.
- sampling is a scan-side predicate on an md5 bucket — no shuffle at all.
- BM25's term list is a literal handful: the tf explode filters to it at the
  scan, df/avgdl are one-row aggregates (broadcast), and the only shuffle is
  the per-(doc, term) groupBy.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

#: denominator of sampling rates: rates are integers in [0, 10000] (basis
#: points) so oracles can state them as exact literals.
RATE_DENOM = 10_000


def _word_ngrams(docs: DataFrame, n: int, text_col: str, id_col: str = "doc_id") -> DataFrame:
    """(id_col, ngram) — DISTINCT word ``n``-grams per document (lowercased,
    whitespace-tokenized). Narrow explode; the distinct is per-doc."""
    words = F.split(F.lower(F.trim(F.col(text_col))), r"\s+")
    return (
        docs.select(F.col(id_col), words.alias("_w"))
        .where(F.size("_w") >= n)
        .select(
            id_col,
            F.explode(
                F.transform(
                    F.sequence(F.lit(0), F.size("_w") - n),
                    lambda i: F.slice(F.col("_w"), i + 1, n),
                )
            ).alias("_t"),
        )
        .select(id_col, F.concat_ws(" ", F.col("_t")).alias("ngram"))
        .distinct()
    )


def decontaminate(
    train: DataFrame,
    benchmark: DataFrame,
    n: int = 5,
    text_col: str = "text",
) -> DataFrame:
    """Benchmark decontamination: for every training doc, count its distinct
    word ``n``-grams that also appear anywhere in the benchmark set.

    Returns one row per TRAIN doc: (doc_id, n_ngrams, n_contaminated,
    contamination_micros, pass_decontamination). A doc passes iff it shares
    ZERO n-grams with the benchmark (the standard strict rule); the
    contamination fraction is reported in integer millionths for graded
    policies downstream.

    Shape: benchmark n-grams are broadcast (eval sets are tiny vs the
    corpus); the train explode is scan-side narrow and the single wide op is
    the groupBy(doc_id). Docs shorter than ``n`` words have 0 n-grams and
    trivially pass.
    """
    train_grams = _word_ngrams(train, n, text_col)
    bench_grams = _word_ngrams(benchmark, n, text_col).select("ngram").distinct()
    flagged = train_grams.join(
        F.broadcast(bench_grams.withColumn("_hit", F.lit(1))), "ngram", "left"
    )
    agg = flagged.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_ngrams"),
        F.sum(F.coalesce(F.col("_hit"), F.lit(0))).alias("n_contaminated"),
    )
    out = (
        train.select("doc_id")
        .join(agg, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce(F.col("n_ngrams"), F.lit(0)).cast("long").alias("n_ngrams"),
            F.coalesce(F.col("n_contaminated"), F.lit(0)).cast("long").alias("n_contaminated"),
        )
    )
    contamination = F.when(
        F.col("n_ngrams") > 0,
        F.floor(F.col("n_contaminated") / F.col("n_ngrams") * 1_000_000),
    ).otherwise(F.lit(0))
    return out.withColumn("contamination_micros", contamination.cast("long")).withColumn(
        "pass_decontamination", F.col("n_contaminated") == 0
    )


def _md5_bucket(col, denom: int, salt: str = "") -> F.Column:
    """Deterministic bucket in [0, denom): first 8 md5 hex digits of
    (salt || id) — the same portable convention as textstats.dataset_split."""
    key = F.concat(F.lit(salt), col.cast("string")) if salt else col.cast("string")
    return (F.conv(F.substring(F.md5(key), 1, 8), 16, 10).cast("long") % denom).cast("int")


def pack_manifest(
    docs: DataFrame,
    capacity: int = 128,
    n_shards: int = 4,
    text_col: str = "text",
) -> DataFrame:
    """Concat-and-chop packing manifest: assign every document's tokens to
    fixed-``capacity`` training sequences, shard by shard.

    Within each shard (md5 bucket of doc_id — stable, engine-portable), the
    documents' whitespace-token streams are concatenated in doc_id order and
    chopped into consecutive sequences of ``capacity`` tokens (the GPT-style
    pre-training layout: document boundaries are ignored, a doc may straddle
    sequences). Returns one row per (doc, sequence) overlap:

      (doc_id, shard_id, seq_id, doc_start, tokens_in_seq)

    where ``doc_start`` is the doc's first-token offset in the shard stream
    and ``tokens_in_seq`` how many of its tokens land in that sequence.
    Zero-token docs produce no rows.

    Shape: ONE window (cumsum partitioned by shard, ordered by doc_id) and a
    narrow per-row sequence explode — ``n_shards`` bounds the per-partition
    stream so the cumsum never serializes the corpus; pick it like an output
    shard count (thousands at 100 TB).
    """
    t = F.trim(F.col(text_col))
    n_tokens = F.when(F.length(t) == 0, F.lit(0)).otherwise(
        F.size(F.split(t, r"\s+"))
    ).cast("long")
    sharded = docs.select(
        "doc_id",
        _md5_bucket(F.col("doc_id"), n_shards).alias("shard_id"),
        n_tokens.alias("_nt"),
    )
    w = (
        Window.partitionBy("shard_id")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    spans = (
        sharded.withColumn("_end", F.sum("_nt").over(w))
        .withColumn("_start", (F.col("_end") - F.col("_nt")))
        .where(F.col("_nt") > 0)
    )
    first_seq = F.floor(F.col("_start") / capacity)
    last_seq = F.floor((F.col("_end") - 1) / capacity)
    out = spans.select(
        "doc_id",
        "shard_id",
        F.col("_start").alias("doc_start"),
        F.col("_end").alias("_end"),
        F.explode(F.sequence(first_seq, last_seq)).alias("seq_id"),
    )
    tokens_in_seq = F.least(
        F.col("_end"), (F.col("seq_id") + 1) * capacity
    ) - F.greatest(F.col("doc_start"), F.col("seq_id") * capacity)
    return out.select(
        "doc_id",
        "shard_id",
        F.col("seq_id").cast("long").alias("seq_id"),
        F.col("doc_start").cast("long").alias("doc_start"),
        tokens_in_seq.cast("long").alias("tokens_in_seq"),
    )


def stratified_sample(
    docs: DataFrame,
    rates_bp: dict[str, int],
    stratum_col: str = "source",
    salt: str = "sample",
) -> DataFrame:
    """Deterministic stratified sample: keep a doc iff its md5 bucket (out of
    ``RATE_DENOM``, salted so it is independent of the train/val/test split
    buckets) falls below its stratum's rate in basis points.

    Strata absent from ``rates_bp`` are dropped entirely (rate 0) — the
    explicit-allowlist convention a curation pass wants. Membership is stable
    under corpus growth, repartitioning, and engine (md5 is the portable
    hash), and the filter is scan-side — zero shuffles.
    """
    rate = F.lit(0)
    for stratum, bp in sorted(rates_bp.items()):
        rate = F.when(F.col(stratum_col) == stratum, F.lit(int(bp))).otherwise(rate)
    return (
        docs.withColumn("sample_bucket", _md5_bucket(F.col("doc_id"), RATE_DENOM, salt=salt))
        .withColumn("_rate_bp", rate)
        .where(F.col("sample_bucket") < F.col("_rate_bp"))
        .drop("_rate_bp")
    )


def solve_mix_rates(
    counts: dict[str, int], weights: dict[str, float], budget: int
) -> dict[str, int]:
    """Water-filling solve (driver-side, #domains-bounded): per-domain
    sampling rates (basis points) such that the expected kept count is
    ≈ ``budget`` with kept_d ∝ ``weights`` wherever the domain has enough
    docs, and capped at 100% where it does not — the undersized domains'
    shortfall is reallocated to the rest (the standard domain-mixing rule).

    Exact breakpoint sweep: kept(T) = Σ_d min(n_d, w_d·T) is piecewise linear
    and increasing in the scale T; find T* with kept(T*) = budget by visiting
    the n_d/w_d breakpoints in order. All arithmetic is exact (Fraction), so
    the floor to basis points is deterministic — no float-boundary flips —
    and realized counts are ≤ budget (never over).
    """
    from fractions import Fraction

    doms = [d for d in sorted(weights) if weights[d] > 0 and counts.get(d, 0) > 0]
    if not doms or budget <= 0:
        return {d: 0 for d in sorted(weights)}
    wf = {d: Fraction(weights[d]) for d in doms}
    total = sum(counts[d] for d in doms)
    budget = min(budget, total)
    # sweep breakpoints T_d = n_d / w_d in increasing order; below T_d domain
    # d is unsaturated (contributes w_d·T), above it contributes n_d.
    marks = sorted(doms, key=lambda d: Fraction(counts[d]) / wf[d])
    kept_sat = Fraction(0)  # saturated domains' total
    w_unsat = sum(wf[d] for d in doms)
    t_star = None
    for d in marks:
        t_d = Fraction(counts[d]) / wf[d]
        if kept_sat + w_unsat * t_d >= budget:
            t_star = (budget - kept_sat) / w_unsat
            break
        kept_sat += counts[d]
        w_unsat -= wf[d]
    if t_star is None:  # budget == total
        t_star = max(Fraction(counts[d]) / wf[d] for d in doms)
    rates = {}
    for d in sorted(weights):
        if d not in doms:
            rates[d] = 0
        else:
            frac = min(Fraction(1), wf[d] * t_star / counts[d])
            rates[d] = min(RATE_DENOM, int(frac * RATE_DENOM))
    return rates


def mix_domains(
    docs: DataFrame,
    weights: dict[str, float],
    budget: int,
    stratum_col: str = "source",
    salt: str = "mix",
) -> tuple[DataFrame, dict[str, int]]:
    """Domain mixing: sample ``docs`` down to ≈ ``budget`` rows with domain
    proportions following ``weights`` (water-filled where a domain is too
    small — see :func:`solve_mix_rates`). Returns (sampled frame, the solved
    per-domain rates in basis points).

    The only driver-side data is the per-domain count map — bounded by the
    number of domains, never by corpus size.
    """
    counts = {
        r[stratum_col]: r["n"]
        for r in docs.groupBy(stratum_col).agg(F.count(F.lit(1)).alias("n")).collect()
    }
    rates = solve_mix_rates(counts, weights, budget)
    return stratified_sample(docs, rates, stratum_col=stratum_col, salt=salt), rates


def bm25_scores(
    docs: DataFrame,
    terms: list[str],
    k1: float = 1.2,
    b: float = 0.75,
    text_col: str = "text",
) -> DataFrame:
    """Okapi BM25 score of every document against a small ``terms`` set
    (lowercased whole-word matches). Returns docs with at least one hit:

      (doc_id, n_terms_matched, score_micros)  — score in integer millionths.

    idf uses the +1-smoothed Robertson form ln(1 + (N − df + 0.5)/(df + 0.5))
    so it is always positive. The float pipeline (idf, the k1/b saturation,
    the per-doc sum) is frozen in the same operation order as the DuckDB
    oracle; the micros floor makes the comparison engine-stable.

    Shape: terms are a literal handful → the tf explode filters at the scan
    and the df/avgdl aggregates are one-row broadcasts; the per-(doc, term)
    groupBy is the only real shuffle.
    """
    from repostcheckerbot_spark.functions.partitioning import spread_to_parallelism

    words = F.split(F.lower(F.trim(F.col(text_col))), r"\s+")
    # spread the single-row-group scan before the word split + explode,
    # which otherwise runs single-task (functions/partitioning.py)
    base = (
        spread_to_parallelism(docs.select("doc_id", text_col))
        .select(
            "doc_id",
            words.alias("_w"),
            F.when(F.length(F.trim(F.col(text_col))) == 0, F.lit(0))
            .otherwise(F.size(words))
            .cast("long")
            .alias("dl"),
        )
        # base feeds BOTH the corpus stats aggregate and the tf explode —
        # the lazy checkpoint (materialized by the stats broadcast) runs
        # the scan + word split once instead of once per consumer
        .localCheckpoint(eager=False)
    )
    stats = base.agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.avg("dl").alias("avgdl"),
    )
    tf = (
        base.select("doc_id", "dl", F.explode("_w").alias("term"))
        .where(F.col("term").isin(*[t.lower() for t in terms]))
        .groupBy("doc_id", "dl", "term")
        .agg(F.count(F.lit(1)).cast("long").alias("tf"))
    )
    df = tf.groupBy("term").agg(F.count(F.lit(1)).cast("long").alias("df"))
    scored = (
        tf.join(F.broadcast(df), "term")
        .crossJoin(F.broadcast(stats))
        .withColumn(
            "_idf",
            F.log(
                F.lit(1.0)
                + (F.col("n_docs") - F.col("df") + F.lit(0.5)) / (F.col("df") + F.lit(0.5))
            ),
        )
        .withColumn(
            "_contrib",
            F.col("_idf")
            * (F.col("tf") * (k1 + 1))
            / (F.col("tf") + k1 * (1 - b + b * F.col("dl") / F.col("avgdl"))),
        )
    )
    return (
        scored.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("int").alias("n_terms_matched"),
            F.floor(F.sum("_contrib") * 1_000_000).cast("long").alias("score_micros"),
        )
    )
