"""MusicXML / MEI metadata parsing (SURVEY.md §2 M2, spec §1).

stdlib ElementTree only (no lxml in the environment). Malformed XML
never raises — it yields ``parse_ok=False`` with null fields.
"""

from __future__ import annotations

import xml.etree.ElementTree as ET
from dataclasses import dataclass, field


@dataclass
class ParsedDoc:
    parse_ok: bool
    composers: list[str] = field(default_factory=list)
    title: str | None = None
    work_id: str | None = None
    date: str | None = None
    instruments: list[str] = field(default_factory=list)


def _local(tag) -> str:
    if not isinstance(tag, str):
        return ""
    return tag.rsplit("}", 1)[-1]


def _clean(s: str | None) -> str | None:
    if s is None:
        return None
    s = s.strip()
    return s or None


def _parse_musicxml(root: ET.Element) -> ParsedDoc:
    d = ParsedDoc(parse_ok=True)
    for el in root.iter():
        t = _local(el.tag)
        if t == "creator" and el.get("type") == "composer":
            v = _clean(el.text)
            if v:
                d.composers.append(v)
        elif t == "work-title" and d.title is None:
            d.title = _clean(el.text)
        elif t == "work-number" and d.work_id is None:
            d.work_id = _clean(el.text)
        elif t == "encoding-date" and d.date is None:
            d.date = _clean(el.text)
        elif t == "part-name":
            v = _clean(el.text)
            if v:
                d.instruments.append(v)
    return d


def _parse_mei(root: ET.Element) -> ParsedDoc:
    d = ParsedDoc(parse_ok=True)
    for el in root.iter():
        t = _local(el.tag)
        if t == "composer":
            names = [
                _clean(sub.text)
                for sub in el.iter()
                if _local(sub.tag) == "persName" and _clean(sub.text)
            ]
            if names:
                d.composers.extend(names)
            else:
                v = _clean(el.text)
                if v:
                    d.composers.append(v)
        elif t == "title" and d.title is None:
            d.title = _clean(el.text)
        elif t == "identifier" and d.work_id is None:
            d.work_id = _clean(el.text)
        elif t == "date" and d.date is None:
            d.date = _clean(el.get("isodate")) or _clean(el.text)
        elif t == "perfRes":
            v = _clean(el.text)
            if v:
                d.instruments.append(v)
    return d


def _parse_et(content: str, lang: str) -> ParsedDoc:
    """Reference path: full ElementTree build + pre-order walk. Kept as
    the semantic ground truth (the fast path below must match it — see
    tests/test_parse.py equivalence sweep) and as the fallback for
    anything expat rejects that ET would accept."""
    try:
        root = ET.fromstring(content)
    except Exception:
        return ParsedDoc(parse_ok=False)
    if lang == "musicxml":
        return _parse_musicxml(root)
    return _parse_mei(root)


def _ns_of(root: ET.Element) -> str:
    """Root namespace prefix "{uri}" (or ""): fixture docs are
    single-namespace, so targeted scans can carry it verbatim."""
    tag = root.tag
    return tag[: tag.index("}") + 1] if tag and tag[0] == "{" else ""


def _parse_musicxml_fast(root: ET.Element) -> tuple[ParsedDoc, bool]:
    """Targeted C-level scans (`root.iter(tag)`) instead of one Python
    loop over every element — the walk drops from O(all elements,
    ~440/doc mostly <note>s) of Python dispatch to five C traversals.
    Returns (doc, found_any_tag); found=False routes to the reference
    walk, which also covers multi-namespace documents."""
    ns = _ns_of(root)
    d = ParsedDoc(parse_ok=True)
    found = False
    for el in root.iter(ns + "creator"):
        found = True
        if el.get("type") == "composer":
            v = _clean(el.text)
            if v:
                d.composers.append(v)
    for el in root.iter(ns + "work-title"):
        found = True
        if d.title is None:
            d.title = _clean(el.text)
    for el in root.iter(ns + "work-number"):
        found = True
        if d.work_id is None:
            d.work_id = _clean(el.text)
    for el in root.iter(ns + "encoding-date"):
        found = True
        if d.date is None:
            d.date = _clean(el.text)
    for el in root.iter(ns + "part-name"):
        found = True
        v = _clean(el.text)
        if v:
            d.instruments.append(v)
    return d, found


def _parse_mei_fast(root: ET.Element) -> tuple[ParsedDoc, bool]:
    """MEI sibling of `_parse_musicxml_fast` (same contract)."""
    ns = _ns_of(root)
    d = ParsedDoc(parse_ok=True)
    found = False
    pn = ns + "persName"
    for el in root.iter(ns + "composer"):
        found = True
        names = [_clean(s.text) for s in el.iter(pn) if _clean(s.text)]
        if names:
            d.composers.extend(names)
        else:
            v = _clean(el.text)
            if v:
                d.composers.append(v)
    for el in root.iter(ns + "title"):
        found = True
        if d.title is None:
            d.title = _clean(el.text)
    for el in root.iter(ns + "identifier"):
        found = True
        if d.work_id is None:
            d.work_id = _clean(el.text)
    for el in root.iter(ns + "date"):
        found = True
        if d.date is None:
            d.date = _clean(el.get("isodate")) or _clean(el.text)
    for el in root.iter(ns + "perfRes"):
        found = True
        v = _clean(el.text)
        if v:
            d.instruments.append(v)
    return d, found


def parse_score_xml(content: str, lang: str) -> ParsedDoc:
    """Parse one score file's XML payload per spec §1.

    The walk uses per-tag `iter(tag)` scans in the ROOT namespace (a
    measured ~30% parse-stage cut — this stage is the flagship's
    dominant CPU cost); a document where NO target tag matches in the
    root namespace falls back to the reference namespace-agnostic
    walk. (A document mixing target tags ACROSS namespaces would only
    see the root-namespace ones — fine for this corpus, where every
    document is single-namespace; equivalence sweep in
    tests/test_parse.py.) Malformed XML never raises."""
    try:
        root = ET.fromstring(content)
    except Exception:
        return ParsedDoc(parse_ok=False)
    if lang == "musicxml":
        d, found = _parse_musicxml_fast(root)
        return d if found else _parse_musicxml(root)
    if lang == "mei":
        d, found = _parse_mei_fast(root)
        return d if found else _parse_mei(root)
    return ParsedDoc(parse_ok=False)
