"""Table-driven + property tests for normalization (SURVEY.md §5.4/5.5)."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from kgray.normalize import norm_date, norm_name, norm_text, slug, tokens
from reference_impl.oracle import _fold_plain, _norm_person

CASES_NAME = [
    ("Johann Sebastian Bach", "johann sebastian bach"),
    ("Bach, Johann Sebastian", "johann sebastian bach"),
    ("Johann Sebastian Bach (1685-1750)", "johann sebastian bach"),
    ("Bach, Johann Sebastian (1685-1750)", "johann sebastian bach"),
    ("  Antonín   Dvořák ", "antonin dvorak"),
    ("SAINT-SAËNS, Camille", "camille saint saens"),
    ("J. S. Bach", "j s bach"),
    ("", ""),
    ("Mozart", "mozart"),
    ("(1756-1791)", ""),
]

CASES_TEXT = [
    ("Symphony No. 9 in D minor, Op. 125", "symphony no 9 in d minor op 125"),
    ("Violoncello", "violoncello"),
    ("Concerto for Flöte", "concerto for flote"),
]


def test_norm_name_table():
    for raw, want in CASES_NAME:
        assert norm_name(raw) == want, raw


def test_norm_text_table():
    for raw, want in CASES_TEXT:
        assert norm_text(raw) == want, raw


def test_norm_text_keeps_commas_unswapped():
    assert norm_text("Sonata, Op. 1") == "sonata op 1"


def test_norm_date():
    assert norm_date("1787-05-01") == ("1787-05-01", 1787, 1787)
    assert norm_date(" c. 1700 ") == ("c. 1700", 1700, 1700)
    assert norm_date("1685-1750") == ("1685-1750", 1685, 1750)
    assert norm_date("unknown") == ("unknown", None, None)


def test_tokens_and_slug():
    assert tokens("johann sebastian bach") == ["johann", "sebastian", "bach"]
    assert tokens("") == []
    assert slug("johann sebastian bach") == "johann_sebastian_bach"


FREE = st.text(max_size=40)


@given(FREE)
@settings(max_examples=300, deadline=None)
def test_idempotent_and_matches_oracle(s):
    n = norm_name(s)
    assert norm_name(n) == n  # idempotence
    assert norm_text(norm_text(s)) == norm_text(s)
    # independent implementations agree
    assert n == _norm_person(s)
    assert norm_text(s) == _fold_plain(s)
