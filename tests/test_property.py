"""Property-based tests (hypothesis): the host-side scorer algebra that the
DuckDB oracles rely on, exercised over generated inputs rather than fixtures.
No SparkSession needed — these run in milliseconds."""

from __future__ import annotations

import duckdb
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from repostcheckerbot_spark.operators.scoring import _jaro, _jaro_winkler

_texts = st.text(alphabet="abcdef ", max_size=24)


@pytest.fixture(scope="module")
def duck():
    return duckdb.connect()


@settings(max_examples=300, deadline=None)
@given(a=_texts, b=_texts)
def test_jaro_matches_duckdb(a, b):
    con = duckdb.connect()
    want_j, want_jw = con.sql(
        "SELECT jaro_similarity(?, ?), jaro_winkler_similarity(?, ?)",
        params=[a, b, a, b],
    ).fetchone()
    assert abs(_jaro(a, b) - want_j) < 1e-12
    assert abs(_jaro_winkler(a, b) - want_jw) < 1e-12


@settings(max_examples=200, deadline=None)
@given(a=_texts, b=_texts)
def test_jaro_symmetry_and_bounds(a, b):
    j = _jaro(a, b)
    assert 0.0 <= j <= 1.0
    assert abs(j - _jaro(b, a)) < 1e-12  # symmetric
    jw = _jaro_winkler(a, b)
    assert jw >= j - 1e-12  # prefix bonus never lowers the score


@settings(max_examples=100, deadline=None)
@given(s=st.text(alphabet="abcdef", min_size=1, max_size=24))
def test_jaro_identity(s):
    assert _jaro(s, s) == 1.0
    assert _jaro_winkler(s, s) == 1.0


@settings(max_examples=100, deadline=None)
@given(hv=st.lists(st.integers(min_value=0, max_value=2**63 - 1), min_size=1, max_size=200))
def test_oph_signature_is_set_function(hv):
    """The OPH MinHash signature must depend only on the SET of shingle
    hashes — order and multiplicity invariant (the property banding
    correctness rests on)."""
    import numpy as np

    from repostcheckerbot_spark.operators.blocking import _oph_signature

    a = np.asarray(hv, dtype=np.uint64)
    shuffled = np.asarray(list(reversed(hv)) + [hv[0]], dtype=np.uint64)  # reorder + dup
    s1 = _oph_signature(a, 16)
    s2 = _oph_signature(shuffled, 16)
    assert (s1 == s2).all()


# ----- graph-referee algebra (the sequential definitions the Spark
# clustering operators are oracled against) -----

_node_ids = st.integers(min_value=0, max_value=30).map(lambda i: f"v{i:02d}")
_edge_lists = st.lists(
    st.tuples(_node_ids, _node_ids), min_size=0, max_size=60
)


@settings(max_examples=150, deadline=None)
@given(edges=_edge_lists)
def test_kwikcluster_structural_invariants(edges):
    from repostcheckerbot_spark.operators.referee import kwikcluster_sequential

    nodes = sorted({x for p in edges for x in p})
    got = dict(kwikcluster_sequential(nodes, edges))
    adj = {n: set() for n in nodes}
    for a, b in edges:
        if a != b:
            adj[a].add(b)
            adj[b].add(a)
    assert set(got) == set(nodes)
    pivots = set(got.values())
    for p in pivots:
        assert not (adj[p] & pivots)  # independent set
    for n, c in got.items():
        assert n == c or c in adj[n]  # one hop from the pivot


@settings(max_examples=100, deadline=None)
@given(
    edges=st.lists(
        st.tuples(_node_ids, _node_ids, st.integers(min_value=0, max_value=9)),
        max_size=60,
    )
)
def test_single_linkage_levels_nesting(edges):
    from repostcheckerbot_spark.operators.referee import single_linkage_levels

    rows = single_linkage_levels([], edges, [2, 5, 9])
    by_t = {}
    for n, t, c in rows:
        by_t.setdefault(t, {})[n] = c
    for tight, loose in ((2, 5), (5, 9)):
        rep = {}
        for n, c in by_t.get(tight, {}).items():
            if c in rep:
                assert by_t[loose][n] == rep[c]  # monotone nesting
            else:
                rep[c] = by_t[loose][n]


@settings(max_examples=100, deadline=None)
@given(edges=_edge_lists, k=st.integers(min_value=3, max_value=5))
def test_ktruss_fixpoint_and_idempotent(edges, k):
    from repostcheckerbot_spark.operators.referee import ktruss_sequential

    out = ktruss_sequential(edges, k)
    adj = {}
    for a, b in out:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    for a, b in out:
        assert len(adj[a] & adj[b]) >= k - 2  # fixpoint
    assert ktruss_sequential(out, k) == out  # idempotent
