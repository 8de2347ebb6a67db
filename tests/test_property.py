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
