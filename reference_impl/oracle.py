"""Independent sequential implementation of docs/PIPELINE_SPEC.md.

Single process, one record at a time, plain dicts and loops — the
shape of the original scoregraph scripts (SURVEY.md §3.1). Used to
produce golden triples and the per-row sha256 invariant for the P/R
gate. Intentionally shares NO code with kgray/.
"""

from __future__ import annotations

import hashlib
import re
import unicodedata
import xml.etree.ElementTree as ET

import pyarrow as pa

PRIORITY = ["dbpedia", "viaf", "europeana"]
THETA = 0.80


# -- normalization (spec §3), re-implemented ---------------------------------

def _fold_plain(text: str) -> str:
    decomposed = unicodedata.normalize("NFKD", text)
    kept = []
    for ch in decomposed:
        if unicodedata.category(ch) == "Mn":
            continue
        kept.append(ch)
    lowered = "".join(kept).casefold()
    cleaned = []
    for ch in lowered:
        if ("a" <= ch <= "z") or ("0" <= ch <= "9"):
            cleaned.append(ch)
        else:
            cleaned.append(" ")
    return " ".join("".join(cleaned).split())


_PARENS_WITH_DIGIT = re.compile(r"\([^)]*[0-9][^)]*\)")


def _norm_person(text: str) -> str:
    while True:
        stripped = _PARENS_WITH_DIGIT.sub("", text)
        if stripped == text:
            break
        text = stripped
    if text.count(",") == 1:
        head, tail = text.split(",")
        text = tail.strip() + " " + head.strip()
    return _fold_plain(text)


def _norm_by_type(text: str, kind: str) -> str:
    if kind == "agent":
        return _norm_person(text)
    return _fold_plain(text)


# -- similarity (spec §4), re-implemented (full-matrix DP / index walk) ------

def _edit_distance(s: str, t: str) -> int:
    rows, cols = len(s) + 1, len(t) + 1
    m = [[0] * cols for _ in range(rows)]
    for i in range(rows):
        m[i][0] = i
    for j in range(cols):
        m[0][j] = j
    for i in range(1, rows):
        for j in range(1, cols):
            sub = m[i - 1][j - 1] + (0 if s[i - 1] == t[j - 1] else 1)
            m[i][j] = min(m[i - 1][j] + 1, m[i][j - 1] + 1, sub)
    return m[-1][-1]


def _jaro_sim(s: str, t: str) -> float:
    if not s and not t:
        return 1.0
    if not s or not t:
        return 0.0
    radius = max(len(s), len(t)) // 2 - 1
    if radius < 0:
        radius = 0
    s_matched = [False] * len(s)
    t_matched = [False] * len(t)
    n_match = 0
    for i, ch in enumerate(s):
        start = max(0, i - radius)
        end = min(len(t), i + radius + 1)
        for j in range(start, end):
            if t_matched[j] or t[j] != ch:
                continue
            s_matched[i] = True
            t_matched[j] = True
            n_match += 1
            break
    if n_match == 0:
        return 0.0
    s_seq = [s[i] for i in range(len(s)) if s_matched[i]]
    t_seq = [t[j] for j in range(len(t)) if t_matched[j]]
    half_transposed = sum(1 for a, b in zip(s_seq, t_seq) if a != b) / 2.0
    m = float(n_match)
    return (m / len(s) + m / len(t) + (m - half_transposed) / m) / 3.0


def _jw(s: str, t: str) -> float:
    base = _jaro_sim(s, t)
    shared = 0
    for k in range(min(4, len(s), len(t))):
        if s[k] != t[k]:
            break
        shared += 1
    return base + shared * 0.1 * (1.0 - base)


def _pair_score(a: str, b: str) -> float:
    longest = max(len(a), len(b))
    if longest == 0:
        return 0.0
    return 0.6 * _jw(a, b) + 0.4 * (1.0 - _edit_distance(a, b) / longest)


# -- XML parsing (spec §1), recursive traversal ------------------------------

def _tagname(el) -> str:
    t = el.tag
    if isinstance(t, str) and "}" in t:
        return t.split("}")[-1]
    return t if isinstance(t, str) else ""


def _txt(el) -> str | None:
    if el.text is None:
        return None
    v = el.text.strip()
    return v if v else None


def _extract_fields(root, lang: str) -> dict:
    fields = {"composers": [], "title": None, "work_id": None, "date": None, "instruments": []}

    def walk_musicxml(el):
        name = _tagname(el)
        if name == "creator" and el.attrib.get("type") == "composer":
            v = _txt(el)
            if v:
                fields["composers"].append(v)
        elif name == "work-title" and fields["title"] is None:
            fields["title"] = _txt(el)
        elif name == "work-number" and fields["work_id"] is None:
            fields["work_id"] = _txt(el)
        elif name == "encoding-date" and fields["date"] is None:
            fields["date"] = _txt(el)
        elif name == "part-name":
            v = _txt(el)
            if v:
                fields["instruments"].append(v)
        for child in list(el):
            walk_musicxml(child)

    def walk_mei(el):
        name = _tagname(el)
        if name == "composer":
            found = []

            def collect(e):
                if _tagname(e) == "persName":
                    v = _txt(e)
                    if v:
                        found.append(v)
                for c in list(e):
                    collect(c)

            collect(el)
            if found:
                fields["composers"].extend(found)
            else:
                v = _txt(el)
                if v:
                    fields["composers"].append(v)
            return  # children already collected
        if name == "title" and fields["title"] is None:
            fields["title"] = _txt(el)
        elif name == "identifier" and fields["work_id"] is None:
            fields["work_id"] = _txt(el)
        elif name == "date" and fields["date"] is None:
            iso = el.attrib.get("isodate")
            iso = iso.strip() if iso else None
            fields["date"] = iso if iso else _txt(el)
        elif name == "perfRes":
            v = _txt(el)
            if v:
                fields["instruments"].append(v)
        for child in list(el):
            walk_mei(child)

    if lang == "musicxml":
        walk_musicxml(root)
    else:
        walk_mei(root)
    return fields


# -- linking (spec §4/§5), brute-force over the vocabulary -------------------

def _build_catalog(vocab_table: pa.Table) -> dict:
    """kind -> list of (vocab, entity_id, [norm names])."""
    catalog: dict[str, list] = {"agent": [], "work": [], "instrument": []}
    for rec in vocab_table.to_pylist():
        kind = rec["entity_type"]
        if kind not in catalog:
            continue
        names = []
        if rec["norm_label"]:
            names.append(rec["norm_label"])
        for alias in rec["aliases"] or []:
            na = _norm_by_type(alias, kind)
            if na and na not in names:
                names.append(na)
        # preserve first-seen order, drop dups
        uniq = []
        for n in names:
            if n not in uniq:
                uniq.append(n)
        if uniq:
            catalog[kind].append((rec["vocab"], rec["entity_id"], uniq))
    return catalog


def _link_mention(kind: str, norm: str, catalog: dict, memo: dict) -> dict:
    key = (kind, norm)
    if key in memo:
        return memo[key]
    result = {"links": {}, "canonical": None, "method": "none"}
    mention_tokens = set(norm.split(" ")) - {""}
    if kind in catalog and mention_tokens:
        best: dict[str, tuple[float, str]] = {}
        for vocab, entity_id, names in catalog[kind]:
            if kind == "agent":
                # fuzzy matching (agents only, spec §4)
                is_candidate = False
                for n in names:
                    if mention_tokens & set(n.split(" ")):
                        is_candidate = True
                        break
                if not is_candidate:
                    continue
                top = 0.0
                for n in names:
                    sc = 1.0 if n == norm else _pair_score(norm, n)
                    if sc > top:
                        top = sc
            else:
                # works / instruments: exact normalized match only
                top = 1.0 if norm in names else 0.0
            if top < THETA:
                continue
            held = best.get(vocab)
            if held is None or top > held[0] or (top == held[0] and entity_id < held[1]):
                best[vocab] = (top, entity_id)
        result["links"] = {v: (e, s) for v, (s, e) in best.items()}
    for v in PRIORITY:
        if v in result["links"]:
            eid, sc = result["links"][v]
            result["canonical"] = eid
            result["method"] = "exact" if sc == 1.0 else "fuzzy"
            break
    if result["canonical"] is None:
        result["canonical"] = kind + ":" + norm.replace(" ", "_")
    memo[key] = result
    return result


# -- fuzzy canonicalization (U3), sequential reference ------------------------

FUZZY_THETA = 0.90


def _doc_mention_rows(rec: dict) -> list[tuple[str, str, str, str, str]]:
    """Per-document mention explosion: (doc_key, work_uri, kind,
    surface, norm) per extracted mention, parse failures and non-score
    languages yielding nothing. The reference's one-record-at-a-time
    shape of the engine's M2..M7 fused stage."""
    if rec["lang"] not in ("musicxml", "mei"):
        return []
    try:
        root = ET.fromstring(rec["content"])
    except Exception:
        return []
    doc_key = f"{rec['repo']}/{rec['path']}@{rec['commit']}"
    fields = _extract_fields(root, rec["lang"])
    work_uri = ("work:" + fields["work_id"]) if fields["work_id"] else ("doc:" + doc_key)
    out = []
    for c in fields["composers"]:
        out.append((doc_key, work_uri, "agent", c, _norm_person(c)))
    if fields["title"]:
        out.append((doc_key, work_uri, "work", fields["title"],
                    _fold_plain(fields["title"])))
    if fields["date"]:
        iso = fields["date"].strip()
        if iso:
            out.append((doc_key, work_uri, "date", fields["date"], iso))
    for ins in fields["instruments"]:
        out.append((doc_key, work_uri, "instrument", ins, _fold_plain(ins)))
    return out


def run_mentions(corpus_table: pa.Table) -> pa.Table:
    """Sequential reference of the mention-extraction segment (engine:
    pipeline.build_mentions): one row per extracted mention, sorted by
    all columns for bit-stable goldens."""
    rows: list[tuple] = []
    for rec in corpus_table.to_pylist():
        rows.extend(_doc_mention_rows(rec))
    rows.sort()
    cols = ["doc_key", "work_uri", "mention_type", "surface", "norm"]
    return pa.table(
        {c: [r[i] for r in rows] for i, c in enumerate(cols)},
        schema=pa.schema([(c, pa.string()) for c in cols]),
    )


def _canonical_rows(corpus_table: pa.Table, vocab_table: pa.Table) -> list[dict]:
    """Per-(kind, norm) canonical records before any fuzzy merging:
    mention counts + linker output (dates get the derived date: uri)."""
    catalog = _build_catalog(vocab_table)
    memo: dict = {}
    counts: dict[tuple, int] = {}
    for rec in corpus_table.to_pylist():
        for _dk, _wu, kind, _surface, norm in _doc_mention_rows(rec):
            counts[(kind, norm)] = counts.get((kind, norm), 0) + 1

    link_cols = ("dbpedia", "viaf", "europeana")
    rows = []
    for (kind, norm), n in counts.items():
        if kind == "date":
            canonical = "date:" + norm.replace(" ", "_")
            links = {}
        else:
            lk = _link_mention(kind, norm, catalog, memo)
            canonical = lk["canonical"]
            links = lk["links"]
        row = {"mention_type": kind, "norm": norm, "n_mentions": n,
               "canonical_uri": canonical}
        for v in link_cols:
            row[f"{v}_id"] = links[v][0] if v in links else None
        rows.append(row)
    return rows


def run_canonical(corpus_table: pa.Table, vocab_table: pa.Table) -> pa.Table:
    """Sequential reference of exact canonicalization (engine:
    canonicalize.canonical_table): per-(kind, norm) counts + links,
    no fuzzy merge. Sorted by (mention_type, norm) for bit-stable
    goldens."""
    rows = _canonical_rows(corpus_table, vocab_table)
    rows.sort(key=lambda r: (r["mention_type"], r["norm"]))
    cols = ["mention_type", "norm", "n_mentions", "canonical_uri",
            "dbpedia_id", "viaf_id", "europeana_id"]
    return pa.table(
        {c: [r[c] for r in rows] for c in cols},
        schema=pa.schema(
            [(c, pa.int64() if c == "n_mentions" else pa.string()) for c in cols]
        ),
    )


def run_canonical_fuzzy(corpus_table: pa.Table, vocab_table: pa.Table,
                        theta: float = FUZZY_THETA) -> pa.Table:
    """Sequential reference of the in-group fuzzy canonical merge:
    per-(kind, norm) canonical rows, agents blocked by last token and
    greedily merged (visit order -n_mentions then norm; join the first
    compatible representative: same authority uri when both linked,
    else pair score >= theta; an unlinked representative adopts the
    first linked variant's links). Independent re-implementation — no
    kgray code."""
    link_cols = ("dbpedia", "viaf", "europeana")
    rows = _canonical_rows(corpus_table, vocab_table)

    out = []
    groups: dict[tuple, list] = {}
    for r in rows:
        if r["mention_type"] != "agent":
            r2 = dict(r)
            r2["block"] = r["norm"]
            r2["n_variants"] = 1
            out.append(r2)
            continue
        b = r["norm"].split(" ")[-1] if r["norm"] else ""
        groups.setdefault(b, []).append(r)

    for b, members in groups.items():
        members.sort(key=lambda r: (-r["n_mentions"], r["norm"]))
        reps: list[dict] = []
        for m in members:
            is_linked = not m["canonical_uri"].startswith("agent:")
            chosen = None
            for rep in reps:
                if is_linked and rep["_linked"]:
                    if m["canonical_uri"] == rep["canonical_uri"]:
                        chosen = rep
                        break
                elif _pair_score(m["norm"], rep["norm"]) >= theta:
                    chosen = rep
                    break
            if chosen is None:
                m2 = dict(m)
                m2["_linked"] = is_linked
                m2["block"] = b
                m2["n_variants"] = 1
                reps.append(m2)
            else:
                chosen["n_mentions"] += m["n_mentions"]
                chosen["n_variants"] += 1
                if is_linked and not chosen["_linked"]:
                    chosen["_linked"] = True
                    chosen["canonical_uri"] = m["canonical_uri"]
                    for v in link_cols:
                        chosen[f"{v}_id"] = m[f"{v}_id"]
        for rep in reps:
            rep.pop("_linked")
            out.append(rep)

    out.sort(key=lambda r: (r["mention_type"], r["block"], r["norm"]))
    cols = ["mention_type", "block", "norm", "n_mentions", "n_variants",
            "canonical_uri", "dbpedia_id", "viaf_id", "europeana_id"]
    return pa.table(
        {c: [r[c] for r in out] for c in cols},
        schema=pa.schema(
            [(c, pa.int64() if c in ("n_mentions", "n_variants") else pa.string())
             for c in cols]
        ),
    )


# -- full run -----------------------------------------------------------------

def run_oracle(corpus_table: pa.Table, vocab_table: pa.Table) -> dict:
    """Sequential end-to-end run.

    Returns {"triples": pa.Table (subj,pred,obj,bucket sorted by s,p,o),
             "shas": {doc_key: sha256hex} for ALL input rows,
             "canonical": {(kind, norm): canonical_uri},
             "counts": {...}}.
    """
    catalog = _build_catalog(vocab_table)
    memo: dict = {}
    triples: set[tuple[str, str, str]] = set()
    shas: dict[str, str] = {}
    n_parsed = 0
    n_mentions = 0

    rows = corpus_table.to_pylist()
    for rec in rows:
        doc_key = f"{rec['repo']}/{rec['path']}@{rec['commit']}"
        shas[doc_key] = hashlib.sha256(rec["content"].encode("utf-8")).hexdigest()
        if rec["lang"] not in ("musicxml", "mei"):
            continue
        try:
            root = ET.fromstring(rec["content"])
        except Exception:
            continue
        n_parsed += 1
        fields = _extract_fields(root, rec["lang"])
        work_uri = ("work:" + fields["work_id"]) if fields["work_id"] else ("doc:" + doc_key)

        mentions = []
        for c in fields["composers"]:
            mentions.append(("agent", c, _norm_person(c)))
        if fields["title"]:
            mentions.append(("work", fields["title"], _fold_plain(fields["title"])))
        if fields["date"]:
            iso = fields["date"].strip()
            if iso:
                mentions.append(("date", fields["date"], iso))
        for ins in fields["instruments"]:
            mentions.append(("instrument", ins, _fold_plain(ins)))
        n_mentions += len(mentions)

        for kind, surface, norm in mentions:
            if kind == "date":
                triples.add((work_uri, "dcterms:date", norm))
                continue
            lk = _link_mention(kind, norm, catalog, memo)
            if kind == "work":
                triples.add((work_uri, "dc:title", surface.strip()))
                for v in PRIORITY:
                    if v in lk["links"]:
                        triples.add((work_uri, "owl:sameAs", lk["links"][v][0]))
            elif kind == "agent":
                cu = lk["canonical"]
                triples.add((work_uri, "dc:creator", cu))
                triples.add((cu, "edm:isRelatedTo", work_uri))
                for v in PRIORITY:
                    if v in lk["links"] and lk["links"][v][0] != cu:
                        triples.add((cu, "owl:sameAs", lk["links"][v][0]))
            elif kind == "instrument":
                triples.add((work_uri, "mo:instrument", lk["canonical"]))

    ordered = sorted(triples)
    buckets = [
        int.from_bytes(hashlib.sha256(s.encode("utf-8")).digest()[:8], "big") % 64
        for s, _, _ in ordered
    ]
    table = pa.table(
        {
            "subj": [t[0] for t in ordered],
            "pred": [t[1] for t in ordered],
            "obj": [t[2] for t in ordered],
            "bucket": pa.array(buckets, type=pa.int32()),
        }
    )
    canonical = {k: v["canonical"] for k, v in memo.items()}
    return {
        "triples": table,
        "shas": shas,
        "canonical": canonical,
        "counts": {"rows": len(rows), "parsed": n_parsed, "mentions": n_mentions},
    }
