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


def parse_score_xml(content: str, lang: str) -> ParsedDoc:
    """Parse one score file's XML payload per spec §1."""
    try:
        root = ET.fromstring(content)
    except Exception:
        return ParsedDoc(parse_ok=False)
    if lang == "musicxml":
        return _parse_musicxml(root)
    if lang == "mei":
        return _parse_mei(root)
    return ParsedDoc(parse_ok=False)
