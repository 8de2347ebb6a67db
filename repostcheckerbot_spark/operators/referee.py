"""Offline flagship referee: an INDEPENDENT plain-Python re-derivation of the
flagship repost clusters — no Spark, no LSH, no shared blocking code.

Purpose: value-hash-oracle the one remaining rows-only query
(``transcripts_flagship_clusters``). difflib scoring + iterative connected
components are not SQL-expressible, but the *result* at a fixed scale factor
is a finite relation — so we recompute it here from first principles (DuckDB
parquet read → pure-Python turn derivation → ALL-PAIRS-within-block
``SequenceMatcher`` → union-find) and embed it as a VALUES literal in
``oracle_sql()``. This is the same offline-reproduction technique that
value-oracled the IVF family (similarity.kmeans_centroids_offline).

Independence argument: the only thing shared with the Spark pipeline is the
SPECIFICATION (sources/testdata.py derivation rules, assembly/normalize/
placeholder semantics, the reference's accept rule ratio > 1 - thresh/10,
/root/reference/database.py:396) — not code paths. Where the Spark side
prunes candidates with MinHash-LSH, the referee scores EVERY same-block pair,
so an oracle match additionally certifies LSH recall 1.0 on this corpus.

Scale note: this is an sf0.01 test referee (hundreds of docs), not a scale
path — blocks bound the pair space and scores are memoized per distinct text
pair, but it is intentionally O(block²) so that it cannot inherit a recall
bug from the system under test.
"""

from __future__ import annotations

import math
from difflib import SequenceMatcher
from functools import lru_cache

#: mirror of functions/text.py PLACEHOLDER_TEXTS (frozen spec, not an import —
#: the referee must not share code with the system under test).
_PLACEHOLDERS = ("&#x200B;", "", "[removed]", "[deleted]")
_WORDS_PER_TURN = 8
_WS = " \t\n\x0b\f\r"


def _derive_docs(sf_dir: str) -> list[tuple[str, str, str, str]]:
    """documents.parquet → [(conv_id, tool, role_seq, norm_text)] per the
    frozen derivation spec (sources/testdata.py:46-92 restated in plain
    Python): words chunked 8-per-turn; 'c' for every doc; 'd' exact repost for
    doc_id ≡ 0 (mod 7); 'n' near repost (turns past 60% word-reversed) for
    doc_id ≡ 0 (mod 5) excluding the former. Placeholder turns are dropped;
    conversations with no surviving turns are dropped."""
    import duckdb

    rows = duckdb.sql(
        f"SELECT doc_id, text, source FROM '{sf_dir}/documents.parquet' ORDER BY doc_id"
    ).fetchall()

    docs: list[tuple[str, str, str, str]] = []

    def emit(prefix: str, doc_id: int, turns: list[str], source: str) -> None:
        keep = [(i, t) for i, t in enumerate(turns) if t not in _PLACEHOLDERS]
        if not keep:
            return
        conv_id = prefix + str(doc_id).rjust(8, "0")
        role_seq = ",".join("user" if i % 2 == 0 else "assistant" for i, _ in keep)
        doc_text = "\n".join(t for _, t in keep)
        norm = doc_text.translate({ord(c): None for c in _WS})
        docs.append((conv_id, source, role_seq, norm))

    for doc_id, text, source in rows:
        words = (text or "").split()
        n_turns = max(math.ceil(len(words) / _WORDS_PER_TURN), 1)
        turns = [
            " ".join(words[i * _WORDS_PER_TURN : (i + 1) * _WORDS_PER_TURN])
            for i in range(n_turns)
        ]
        emit("c", doc_id, turns, source)
        if doc_id % 7 == 0:
            emit("d", doc_id, turns, source)
        elif doc_id % 5 == 0:
            mx = n_turns - 1
            turns_n = [
                " ".join(reversed(t.split(" "))) if i * 10 > mx * 6 else t
                for i, t in enumerate(turns)
            ]
            emit("n", doc_id, turns_n, source)
    return docs


def flagship_clusters_offline(
    sf_dir: str, ratio_threshold: float = 0.5
) -> list[tuple[str, str]]:
    """The flagship result recomputed offline: (conv_id, cluster_id) for every
    derived conversation, cluster_id = lexicographic min of its component.

    Edges: (a) EXACT — identical norm_text, globally (the reference's
    ``Content = ?`` probe is unblocked, database.py:365-377); (b) FUZZY —
    every same-(tool, role-sequence) pair with distinct norm_text and
    ``SequenceMatcher(None, a, b).ratio() > ratio_threshold`` (strict,
    database.py:396), args in canonical conv_id order exactly as the Spark
    scorer passes them. Union-find with min-id roots; singletons map to
    themselves."""
    docs = _derive_docs(sf_dir)

    parent: dict[str, str] = {}

    def find(x: str) -> str:
        root = x
        while parent.get(root, root) != root:
            root = parent[root]
        while parent.get(x, x) != root:
            parent[x], x = root, parent[x]
        return root

    def union(a: str, b: str) -> None:
        ra, rb = find(a), find(b)
        if ra == rb:
            return
        if ra < rb:
            parent[rb] = ra
        else:
            parent[ra] = rb

    # exact edges: same norm_text anywhere
    by_text: dict[str, str] = {}
    for conv_id, _tool, _rs, norm in docs:
        if norm in by_text:
            union(by_text[norm], conv_id)
        else:
            by_text[norm] = conv_id

    # fuzzy edges: all pairs within a (tool, role_seq) block, distinct text
    @lru_cache(maxsize=None)
    def accept(a: str, b: str) -> bool:
        return SequenceMatcher(None, a, b).ratio() > ratio_threshold

    blocks: dict[tuple[str, str], list[tuple[str, str]]] = {}
    for conv_id, tool, role_seq, norm in docs:
        blocks.setdefault((tool, role_seq), []).append((conv_id, norm))
    for members in blocks.values():
        members.sort()
        for i in range(len(members)):
            ca, ta = members[i]
            for j in range(i + 1, len(members)):
                cb, tb = members[j]
                if ta != tb and find(ca) != find(cb) and accept(ta, tb):
                    union(ca, cb)

    return sorted((conv_id, find(conv_id)) for conv_id, _t, _r, _n in docs)


def kwikcluster_sequential(
    nodes: list[str], edges: list[tuple[str, str]]
) -> list[tuple[str, str]]:
    """Sequential referee for ``clustering.pivot_clusters``: the FROZEN
    greedy-PIVOT semantics (KwikCluster, Ailon-Charikar-Newman STOC'05) run
    literally, one pivot at a time, with the derandomized md5 permutation —
    order nodes by (md5(id), id); the smallest unassigned node pivots and
    claims every still-unassigned neighbor; repeat. No MIS rounds, no Spark —
    this is the O(n + m) textbook loop the parallel schedule must equal, used
    both by the pytest equivalence tests and (via a VALUES literal) by the
    driver's DuckDB oracle for ``pivot_clusters_simhash``.

    Returns sorted (node, cluster_id = pivot's original id) covering every
    node in ``nodes`` plus any edge endpoint; isolated nodes self-cluster.
    """
    import hashlib

    def perm_key(n: str) -> tuple[str, str]:
        return (hashlib.md5(n.encode()).hexdigest(), n)

    adj: dict[str, set[str]] = {n: set() for n in nodes}
    for a, b in edges:
        if a == b:
            continue
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)

    assigned: dict[str, str] = {}
    for n in sorted(adj, key=perm_key):
        if n in assigned:
            continue
        assigned[n] = n  # n pivots
        for m in adj[n]:
            if m not in assigned:
                assigned[m] = n
    return sorted(assigned.items())


def single_linkage_levels(
    nodes: list[str],
    weighted_edges: list[tuple[str, str, int]],
    thresholds: list[int],
) -> list[tuple[str, int, str]]:
    """Sequential referee for ``clustering.threshold_clustering``: per
    threshold θ (ascending), union-find with lexicographic-min roots over
    every edge with weight ≤ θ — the textbook definition, no contraction, no
    Spark. Used by the pytest losslessness tests and (as a VALUES literal)
    by the driver's DuckDB oracle. Returns sorted (node, threshold,
    cluster_id) covering ``nodes`` plus every edge endpoint."""
    all_nodes = set(nodes) | {a for a, _b, _w in weighted_edges} | {
        b for _a, b, _w in weighted_edges
    }
    out: list[tuple[str, int, str]] = []
    for t in sorted(set(int(x) for x in thresholds)):
        parent: dict[str, str] = {}

        def find(x: str) -> str:
            root = x
            while parent.get(root, root) != root:
                root = parent[root]
            while parent.get(x, x) != root:
                parent[x], x = root, parent[x]
            return root

        for a, b, w in weighted_edges:
            if w > t or a == b:
                continue
            ra, rb = find(a), find(b)
            if ra == rb:
                continue
            if ra < rb:
                parent[rb] = ra
            else:
                parent[ra] = rb
        out.extend((n, t, find(n)) for n in all_nodes)
    return sorted(out)


def ktruss_sequential(
    edges: list[tuple[str, str]], k: int
) -> list[tuple[str, str]]:
    """Sequential referee for ``clustering.ktruss_edges``: textbook peeling —
    repeatedly delete ANY edge with fewer than k−2 common neighbors until
    none remains. The maximal k-truss is unique (order-independent), so this
    one-at-a-time loop and Spark's simultaneous peel must return the same
    edge set. Returns the surviving edges as sorted canonical (min, max)
    pairs."""
    cur = {(min(a, b), max(a, b)) for a, b in edges if a != b}
    changed = True
    while changed and cur:
        adj: dict[str, set[str]] = {}
        for a, b in cur:
            adj.setdefault(a, set()).add(b)
            adj.setdefault(b, set()).add(a)
        drop = {(a, b) for a, b in cur if len(adj[a] & adj[b]) < k - 2}
        changed = bool(drop)
        cur -= drop
    return sorted(cur)
