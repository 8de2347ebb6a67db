"""Deterministic synthetic transcript fixtures + the reference-semantics oracle.

Implements FIXTURES.md F-1..F-4. Everything is seeded (``random.Random(seed)``)
— no wall-clock, no external data. The pairwise oracle runs the REFERENCE's
text-path formula in plain Python (``difflib.SequenceMatcher(None, a, b)
.ratio()`` on whitespace-stripped, turn-ordered concatenated docs — semantics
of /root/reference/database.py:395-399 with autojunk=True), so golden labels
ARE the reference verdicts.

Family structure: each base conversation may spawn mutants (exact copies,
near-duplicates at several edit rates, turn-permuted copies, chain links).
All members of a family share the blocking key (same ``tool``); labeled pairs
are drawn within families plus sampled same-block negatives — "labeled pairs
at shared blocking keys" per BASELINE.json.
"""

from __future__ import annotations

import random
import string
from dataclasses import dataclass, field
from datetime import datetime, timedelta
from difflib import SequenceMatcher

import pandas as pd

TOOLS = [f"tool_{i:02d}" for i in range(12)]
#: Zipf-ish weights — tool_00 is the hot key (exercises skew handling).
TOOL_WEIGHTS = [1.0 / (i + 1) for i in range(12)]
ROLES = ["user", "assistant", "system", "tool"]
PLACEHOLDERS = ["&#x200B;", "", "[removed]", "[deleted]"]
BASE_TS = datetime(2024, 1, 1)

_VOCAB = [
    "".join(random.Random(1000 + i).choices(string.ascii_lowercase, k=random.Random(2000 + i).randint(3, 9)))
    for i in range(400)
]


def _strip_ws(s: str) -> str:
    return "".join(c for c in s if not c.isspace())


def reference_ratio(doc_a: str, doc_b: str) -> float:
    """The reference's scorer verbatim (database.py:395): autojunk default."""
    return SequenceMatcher(None, _strip_ws(doc_a), _strip_ws(doc_b)).ratio()


@dataclass
class Fixture:
    transcripts: pd.DataFrame
    labeled_pairs: pd.DataFrame
    expected_clusters: pd.DataFrame
    tombstones: pd.DataFrame
    #: conv_ids of rows older than the retention window (dropped at ingest
    #: when retention is enabled)
    aged_conv_ids: list = field(default_factory=list)


def _gen_turns(rng: random.Random, n_turns: int, uniq: str) -> list[tuple[str, str]]:
    """(role, text) per turn; each conv carries unique salt tokens so
    cross-family similarity stays well under the 0.5 verdict floor."""
    out = []
    for t in range(n_turns):
        role = "user" if t % 2 == 0 else "assistant"
        if rng.random() < 0.08:
            role = rng.choice(["system", "tool"])
        words = rng.choices(_VOCAB, k=rng.randint(5, 18))
        # sprinkle the family-unique token to decorrelate families
        words.insert(rng.randrange(len(words) + 1), uniq + str(t))
        out.append((role, " ".join(words)))
    return out


def _mutate_text(rng: random.Random, text: str, edit_rate: float) -> str:
    """Char-level substitutions at ``edit_rate`` (whitespace positions kept)."""
    chars = list(text)
    for i, c in enumerate(chars):
        if not c.isspace() and rng.random() < edit_rate:
            chars[i] = rng.choice(string.ascii_lowercase)
    return "".join(chars)


def _mutate_turns(
    rng: random.Random,
    turns: list[tuple[str, str]],
    replace_rate: float,
    char_noise: float,
    uniq: str,
) -> list[tuple[str, str]]:
    """Repost-style mutation: replace a fraction of turns with fresh text
    (the rest stay verbatim), plus optional light char noise on kept turns.

    The kept-verbatim runs are what both difflib (long matching blocks) and
    MinHash (shared shingles) latch onto, so the ratio band ≈ keep fraction
    and shingle-Jaccard tracks it — the calibration the LSH geometry in
    config.py assumes.
    """
    out = []
    for t, (role, text) in enumerate(turns):
        if rng.random() < replace_rate:
            words = rng.choices(_VOCAB, k=max(3, len(text.split()) + rng.randint(-2, 2)))
            words.insert(rng.randrange(len(words) + 1), uniq + str(t))
            out.append((role, " ".join(words)))
        elif char_noise > 0 and rng.random() < 0.5:
            out.append((role, _mutate_text(rng, text, char_noise)))
        else:
            out.append((role, text))
    return out


def generate(
    n_conv: int = 60,
    seed: int = 42,
    dup_fraction: float = 0.45,
    with_labels: bool = True,
    negatives_per_family: int = 2,
    retention_days: int | None = None,
) -> Fixture:
    rng = random.Random(seed)
    rows: list[dict] = []  # transcript turns
    docs: dict[str, str] = {}  # conv_id -> concatenated doc (turn order)
    conv_meta: dict[str, dict] = {}
    families: list[list[str]] = []
    aged: list[str] = []

    def emit_conv(conv_id: str, turns: list[tuple[str, str]], tool: str, ts: datetime, shuffle_rows=False, extra_placeholders=0):
        conv_rows = []
        for idx, (role, text) in enumerate(turns):
            conv_rows.append(
                dict(conv_id=conv_id, turn_idx=idx, role=role, text=text, tool=tool, ts=ts + timedelta(seconds=idx * 30))
            )
        for j in range(extra_placeholders):
            conv_rows.append(
                dict(
                    conv_id=conv_id,
                    turn_idx=len(turns) + j,
                    role="system",
                    text=rng.choice(PLACEHOLDERS),
                    tool=tool,
                    ts=ts + timedelta(seconds=(len(turns) + j) * 30),
                )
            )
        if shuffle_rows:
            rng.shuffle(conv_rows)
        rows.extend(conv_rows)
        # doc as the pipeline sees it: non-placeholder turns in turn_idx order
        docs[conv_id] = "\n".join(t for _, t in turns)
        conv_meta[conv_id] = dict(tool=tool, ts=ts)

    for i in range(n_conv):
        base_id = f"conv{i:06d}a"
        tool = rng.choices(TOOLS, weights=TOOL_WEIGHTS, k=1)[0]
        ts = BASE_TS + timedelta(minutes=rng.randint(0, 40_000))
        turns = _gen_turns(rng, rng.randint(3, 40), uniq=f"u{i:06d}x")
        family = [base_id]
        emit_conv(base_id, turns, tool, ts, extra_placeholders=1 if rng.random() < 0.2 else 0)

        if rng.random() < dup_fraction:
            kind = rng.random()
            if kind < 0.25:
                # exact duplicate (different conv_id / ts, same tool=block)
                dup_id = f"conv{i:06d}b"
                emit_conv(dup_id, turns, tool, ts + timedelta(hours=rng.randint(1, 72)))
                family.append(dup_id)
            elif kind < 0.40:
                # turn-permuted exact duplicate (input row order shuffled)
                dup_id = f"conv{i:06d}p"
                emit_conv(dup_id, turns, tool, ts + timedelta(hours=rng.randint(1, 72)), shuffle_rows=True)
                family.append(dup_id)
            elif kind < 0.85:
                # near-duplicates spanning the verdict boundary: replace-rate
                # bands target ratio ≈ {0.95, 0.75, 0.55, 0.45, 0.30}
                bands = [(0.05, 0.0), (0.25, 0.0), (0.45, 0.01), (0.55, 0.01), (0.70, 0.02)]
                for band_i, (rep, noise) in enumerate(rng.sample(bands, k=rng.randint(1, 3))):
                    dup_id = f"conv{i:06d}n{band_i}"
                    mturns = _mutate_turns(rng, turns, rep, noise, uniq=f"m{i:06d}x{band_i}")
                    emit_conv(dup_id, mturns, tool, ts + timedelta(hours=rng.randint(1, 72)))
                    family.append(dup_id)
            else:
                # chain: A ≈ B ≈ C with A vs C below the floor → the
                # transitive-closure test (FIXTURES.md)
                prev = turns
                for li, link in enumerate(("b", "c")):
                    dup_id = f"conv{i:06d}h{link}"
                    prev = _mutate_turns(rng, prev, 0.30, 0.0, uniq=f"h{i:06d}x{li}")
                    emit_conv(dup_id, prev, tool, ts + timedelta(hours=rng.randint(1, 72)))
                    family.append(dup_id)

        if retention_days is not None and rng.random() < 0.05:
            old_id = f"conv{i:06d}o"
            old_ts = BASE_TS - timedelta(days=retention_days + rng.randint(10, 100))
            emit_conv(old_id, _gen_turns(rng, 4, uniq=f"o{i:06d}"), tool, old_ts)
            aged.append(old_id)

        families.append(family)

    transcripts = pd.DataFrame(rows)

    # ---- labeled pairs (the F1 oracle) ----------------------------------
    pair_rows = []
    if with_labels:
        fam_index = {cid: fi for fi, fam in enumerate(families) for cid in fam}
        for fam in families:
            for x in range(len(fam)):
                for y in range(x + 1, len(fam)):
                    a, b = sorted((fam[x], fam[y]))
                    ratio = reference_ratio(docs[a], docs[b])
                    pair_rows.append(
                        dict(
                            conv_id_a=a,
                            conv_id_b=b,
                            block_key=conv_meta[a]["tool"],
                            ratio=ratio,
                            is_dup=ratio > 0.5,
                        )
                    )
        # same-block negatives across families
        by_tool: dict[str, list[str]] = {}
        for fam in families:
            by_tool.setdefault(conv_meta[fam[0]]["tool"], []).append(fam[0])
        for tool, ids in by_tool.items():
            if len(ids) < 2:
                continue
            for _ in range(min(negatives_per_family * len(ids) // 2, 40)):
                a, b = sorted(rng.sample(ids, 2))
                if fam_index[a] == fam_index[b]:
                    continue
                ratio = reference_ratio(docs[a], docs[b])
                pair_rows.append(
                    dict(conv_id_a=a, conv_id_b=b, block_key=tool, ratio=ratio, is_dup=ratio > 0.5)
                )
    labeled_pairs = pd.DataFrame(
        pair_rows, columns=["conv_id_a", "conv_id_b", "block_key", "ratio", "is_dup"]
    ).drop_duplicates(["conv_id_a", "conv_id_b"])

    # ---- expected clusters: union-find over is_dup edges ------------------
    parent: dict[str, str] = {cid: cid for cid in docs}

    def find(x: str) -> str:
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    def union(a: str, b: str) -> None:
        ra, rb = find(a), find(b)
        if ra != rb:
            lo, hi = min(ra, rb), max(ra, rb)
            parent[hi] = lo

    for p in pair_rows:
        if p["is_dup"]:
            union(p["conv_id_a"], p["conv_id_b"])
    # canonical representative: lexicographic min of component
    comp: dict[str, list[str]] = {}
    for cid in docs:
        comp.setdefault(find(cid), []).append(cid)
    cluster_rows = []
    for members in comp.values():
        rep = min(members)
        for cid in members:
            cluster_rows.append(dict(conv_id=cid, cluster_id=rep))
    expected_clusters = pd.DataFrame(cluster_rows, columns=["conv_id", "cluster_id"])

    # ---- tombstones: a few duplicate members deleted upstream -------------
    tomb_rows = []
    for fam in families:
        if len(fam) > 1 and rng.random() < 0.06:
            tomb_rows.append(dict(conv_id=fam[1], deleted_ts=BASE_TS + timedelta(days=400)))
    tombstones = pd.DataFrame(tomb_rows, columns=["conv_id", "deleted_ts"])

    return Fixture(transcripts, labeled_pairs, expected_clusters, tombstones, aged)


def to_spark(spark, fixture: Fixture):
    """Materialize fixture frames as Spark DataFrames with the canonical
    transcripts schema (BASELINE.json input_hint)."""
    from pyspark.sql import types as T

    schema = T.StructType(
        [
            T.StructField("conv_id", T.StringType(), False),
            T.StructField("turn_idx", T.IntegerType(), False),
            T.StructField("role", T.StringType(), False),
            T.StructField("text", T.StringType(), True),
            T.StructField("tool", T.StringType(), True),
            T.StructField("ts", T.TimestampType(), True),
        ]
    )
    transcripts = spark.createDataFrame(fixture.transcripts, schema=schema)
    labeled = spark.createDataFrame(fixture.labeled_pairs) if len(fixture.labeled_pairs) else None
    clusters = spark.createDataFrame(fixture.expected_clusters)
    tombstones = (
        spark.createDataFrame(fixture.tombstones) if len(fixture.tombstones) else None
    )
    return transcripts, labeled, clusters, tombstones
