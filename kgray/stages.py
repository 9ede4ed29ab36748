"""Batch-transform stages of the flagship KG pipeline (SURVEY.md §3.3).

Every function here is a `map_batches` body: `pyarrow.Table` in →
`pyarrow.Table` out (`batch_format="pyarrow"`, zero-copy from the
object store). The parse stage is necessarily a Python loop over rows
(XML parsing is per-document by nature) — it is the deliberate
CPU-bound core of the pipeline and scales out across tasks; everything
around it is vectorized or memoized on unique values.

`content` (the wide column) never survives past the extract stage:
mentions carry only narrow strings, so all downstream shuffles move
narrow rows (SURVEY.md §7 risk (e)).
"""

from __future__ import annotations

import hashlib

import pyarrow as pa
import pyarrow.compute as pc

from . import schemas
from .hashing import sha64
from .normalize import norm_date, norm_name, norm_text
from .xmlparse import parse_score_xml

PARSE_LANGS = ("musicxml", "mei")


def with_sha(batch: pa.Table) -> pa.Table:
    """M1: append per-row content_sha256 (the invariant column,
    BASELINE.json input_hint)."""
    shas = [
        None if v is None else hashlib.sha256(v.encode("utf-8")).hexdigest()
        for v in batch["content"].to_pylist()
    ]
    return batch.append_column("content_sha256", pa.array(shas, type=pa.string()))


def extract_mentions(batch: pa.Table) -> pa.Table:
    """Fused M1+M2+M3+M4+M6+M7: corpus batch -> mention rows.

    Computes the sha invariant, filters to parseable langs, parses XML,
    explodes mentions, normalizes surfaces (memoized per batch — the
    Zipfian composer head repeats heavily). Drops `content`.
    """
    mask = pc.is_in(batch["lang"], value_set=pa.array(PARSE_LANGS))
    sub = batch.filter(mask)
    repo = sub["repo"].to_pylist()
    path = sub["path"].to_pylist()
    commit = sub["commit"].to_pylist()
    lang = sub["lang"].to_pylist()
    content = sub["content"].to_pylist()

    name_memo: dict[str, str] = {}
    text_memo: dict[str, str] = {}

    def nn(s: str) -> str:
        r = name_memo.get(s)
        if r is None:
            r = norm_name(s)
            name_memo[s] = r
        return r

    def nt(s: str) -> str:
        r = text_memo.get(s)
        if r is None:
            r = norm_text(s)
            text_memo[s] = r
        return r

    doc_key_c: list[str] = []
    work_uri_c: list[str] = []
    mtype_c: list[str] = []
    surface_c: list[str] = []
    norm_c: list[str] = []

    def emit(dk: str, wu: str, mt: str, surface: str, norm: str) -> None:
        doc_key_c.append(dk)
        work_uri_c.append(wu)
        mtype_c.append(mt)
        surface_c.append(surface)
        norm_c.append(norm)

    for i in range(len(content)):
        d = parse_score_xml(content[i], lang[i])
        if not d.parse_ok:
            continue
        dk = f"{repo[i]}/{path[i]}@{commit[i]}"
        wu = f"work:{d.work_id}" if d.work_id else f"doc:{dk}"
        for c in d.composers:
            emit(dk, wu, "agent", c, nn(c))
        if d.title:
            emit(dk, wu, "work", d.title, nt(d.title))
        if d.date:
            iso, _, _ = norm_date(d.date)
            if iso:
                emit(dk, wu, "date", d.date, iso)
        for ins in d.instruments:
            emit(dk, wu, "instrument", ins, nt(ins))

    return pa.table(
        {
            "doc_key": doc_key_c,
            "work_uri": work_uri_c,
            "mention_type": mtype_c,
            "surface": surface_c,
            "norm": norm_c,
        },
        schema=schemas.MENTIONS,
    )


def emit_triples(batch: pa.Table) -> pa.Table:
    """Spec §6: linked-mention rows -> raw (subj, pred, obj) rows,
    deduped within the batch (the global distinct is a shuffle stage)."""
    mtype = batch["mention_type"].to_pylist()
    work_uri = batch["work_uri"].to_pylist()
    surface = batch["surface"].to_pylist()
    norm = batch["norm"].to_pylist()
    canon = batch["canonical_uri"].to_pylist()
    links = {
        v: batch[f"{v}_id"].to_pylist() for v in ("dbpedia", "viaf", "europeana")
    }
    seen: set[tuple[str, str, str]] = set()
    s_c: list[str] = []
    p_c: list[str] = []
    o_c: list[str] = []

    def emit(s: str, p: str, o: str) -> None:
        t = (s, p, o)
        if t not in seen:
            seen.add(t)
            s_c.append(s)
            p_c.append(p)
            o_c.append(o)

    for i in range(len(mtype)):
        mt = mtype[i]
        wu = work_uri[i]
        if mt == "work":
            emit(wu, "dc:title", surface[i].strip())
            for v in ("dbpedia", "viaf", "europeana"):
                e = links[v][i]
                if e is not None:
                    emit(wu, "owl:sameAs", e)
        elif mt == "date":
            if norm[i]:
                emit(wu, "dcterms:date", norm[i])
        elif mt == "agent":
            cu = canon[i]
            emit(wu, "dc:creator", cu)
            emit(cu, "edm:isRelatedTo", wu)
            for v in ("dbpedia", "viaf", "europeana"):
                e = links[v][i]
                if e is not None and e != cu:
                    emit(cu, "owl:sameAs", e)
        elif mt == "instrument":
            emit(wu, "mo:instrument", canon[i])

    spo64 = pa.array(
        [sha64(f"{s}\x00{p}\x00{o}") - (1 << 63) for s, p, o in zip(s_c, p_c, o_c)],
        type=pa.int64(),
    )
    return pa.table(
        {
            "subj": pa.array(s_c, type=pa.string()),
            "pred": pa.array(p_c, type=pa.string()),
            "obj": pa.array(o_c, type=pa.string()),
            "spo64": spo64,
        }
    )


def finalize_triples(batch: pa.Table) -> pa.Table:
    """Drop the dedup key, add the write-partition bucket column."""
    bucket = pa.array(
        [sha64(s) % 64 for s in batch["subj"].to_pylist()], type=pa.int32()
    )
    return batch.drop_columns(["spo64"]).append_column("bucket", bucket)
