"""Name / text / date normalization (SURVEY.md §2 M6/M7/M8,
docs/PIPELINE_SPEC.md §3).

Pure functions of one string; the Ray stages vectorize them over the
unique values of a batch (`pyarrow.compute.unique` first — surface
forms repeat heavily under the Zipfian composer distribution).
"""

from __future__ import annotations

import re
import unicodedata

_PAREN_DIGIT = re.compile(r"\([^)]*[0-9][^)]*\)")  # ASCII digits (spec §3)
_YEAR = re.compile(r"\d{4}")
_NON_ALNUM = re.compile(r"[^a-z0-9]+")


def _fold(s: str) -> str:
    """NFKD-decompose, drop combining marks, casefold, punct->space,
    collapse whitespace."""
    s = unicodedata.normalize("NFKD", s)
    s = "".join(c for c in s if unicodedata.category(c) != "Mn")
    s = s.casefold()
    s = _NON_ALNUM.sub(" ", s)
    return " ".join(s.split())


def norm_name(s: str) -> str:
    """Agent-name normalization: strip life-date parens, swap a single
    'Last, First', then fold (spec §3 steps 1-6)."""
    prev = None
    while prev != s:
        prev = s
        s = _PAREN_DIGIT.sub("", s)
    if s.count(",") == 1:
        last, first = s.split(",")
        s = first.strip() + " " + last.strip()
    return _fold(s)


def norm_text(s: str) -> str:
    """Title / instrument normalization: fold only."""
    return _fold(s)


def norm_date(s: str) -> tuple[str, int | None, int | None]:
    """Partial-date normalization -> (iso, y0, y1); years = all \\d{4}."""
    iso = s.strip()
    years = [int(y) for y in _YEAR.findall(iso)]
    if not years:
        return iso, None, None
    return iso, min(years), max(years)


def tokens(norm: str) -> list[str]:
    return [t for t in norm.split(" ") if t]


def slug(norm: str) -> str:
    return norm.replace(" ", "_")


def normalize_for_type(s: str, mention_type: str) -> str:
    """Dispatch used by both mention normalization and vocab alias
    normalization: agents get the comma-swap/life-date rules."""
    return norm_name(s) if mention_type == "agent" else norm_text(s)
