"""Unit + property tests for the similarity kernels (SURVEY.md §5.4/5.5)."""

from __future__ import annotations

import math

from hypothesis import given, settings
from hypothesis import strategies as st

from kgray.similarity import combined_score, jaro, jaro_winkler, levenshtein
from reference_impl.oracle import _edit_distance, _jaro_sim, _jw, _pair_score

WORDS = st.text(alphabet="abcdefgh ", max_size=12)


def test_levenshtein_known():
    assert levenshtein("kitten", "sitting") == 3
    assert levenshtein("", "abc") == 3
    assert levenshtein("abc", "") == 3
    assert levenshtein("abc", "abc") == 0
    assert levenshtein("flaw", "lawn") == 2


def test_jaro_known():
    # classic textbook values
    assert math.isclose(jaro("MARTHA", "MARHTA"), 0.944444, abs_tol=1e-5)
    assert math.isclose(jaro("DIXON", "DICKSONX"), 0.766667, abs_tol=1e-5)
    assert jaro("", "") == 1.0
    assert jaro("a", "") == 0.0


def test_jaro_winkler_known():
    assert math.isclose(jaro_winkler("MARTHA", "MARHTA"), 0.961111, abs_tol=1e-5)
    assert math.isclose(jaro_winkler("DIXON", "DICKSONX"), 0.813333, abs_tol=1e-5)
    assert jaro_winkler("same", "same") == 1.0


@given(WORDS, WORDS)
@settings(max_examples=200, deadline=None)
def test_symmetry_and_range(a, b):
    assert levenshtein(a, b) == levenshtein(b, a)
    j = jaro(a, b)
    assert 0.0 <= j <= 1.0
    assert math.isclose(jaro(a, b), jaro(b, a), abs_tol=1e-12)
    jw = jaro_winkler(a, b)
    assert 0.0 <= jw <= 1.0 + 1e-12
    assert jw >= j - 1e-12  # winkler boost never decreases


@given(WORDS, WORDS, WORDS)
@settings(max_examples=100, deadline=None)
def test_lev_triangle(a, b, c):
    assert levenshtein(a, c) <= levenshtein(a, b) + levenshtein(b, c)


@given(WORDS)
@settings(max_examples=100, deadline=None)
def test_identity(a):
    assert levenshtein(a, a) == 0
    assert jaro(a, a) == 1.0
    assert jaro_winkler(a, a) == 1.0


@given(WORDS, WORDS)
@settings(max_examples=300, deadline=None)
def test_engine_matches_oracle_kernels(a, b):
    """The two independent implementations must agree bit-for-bit
    (the P/R gate depends on it)."""
    assert levenshtein(a, b) == _edit_distance(a, b)
    assert jaro(a, b) == _jaro_sim(a, b)
    assert jaro_winkler(a, b) == _jw(a, b)
    assert combined_score(a, b) == _pair_score(a, b)
