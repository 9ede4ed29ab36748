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


_VOCABS = ("dbpedia", "viaf", "europeana")


def _spo(subj: pa.Array, pred: str, obj: pa.Array) -> pa.Table:
    return pa.table(
        {
            "subj": subj,
            "pred": pa.array([pred] * len(subj), type=pa.string()),
            "obj": obj,
        }
    )


def emit_triples(batch: pa.Table) -> pa.Table:
    """Spec §6: linked-mention rows -> raw (subj, pred, obj) rows.

    Fully vectorized: per-mention-type masks + columnar assembly
    (pyarrow kernels), then one C++ hash group-by for the in-block
    dedup. (The original per-row Python loop was the pipeline's
    hotspot: 25s of 51s at 8 CPUs on the 600k-row bench corpus.)
    """
    out: list[pa.Table] = []
    mt = batch["mention_type"]

    w = batch.filter(pc.equal(mt, "work"))
    if len(w):
        out.append(_spo(w["work_uri"], "dc:title", pc.utf8_trim_whitespace(w["surface"])))
        for v in _VOCABS:
            lk = w.filter(pc.is_valid(w[f"{v}_id"]))
            if len(lk):
                out.append(_spo(lk["work_uri"], "owl:sameAs", lk[f"{v}_id"]))

    d = batch.filter(pc.equal(mt, "date"))
    if len(d):
        d = d.filter(pc.not_equal(d["norm"], ""))
        if len(d):
            out.append(_spo(d["work_uri"], "dcterms:date", d["norm"]))

    a = batch.filter(pc.equal(mt, "agent"))
    if len(a):
        out.append(_spo(a["work_uri"], "dc:creator", a["canonical_uri"]))
        out.append(_spo(a["canonical_uri"], "edm:isRelatedTo", a["work_uri"]))
        for v in _VOCABS:
            col = a[f"{v}_id"]
            mask = pc.and_(
                pc.is_valid(col), pc.not_equal(pc.fill_null(col, ""), a["canonical_uri"])
            )
            lk = a.filter(mask)
            if len(lk):
                out.append(_spo(lk["canonical_uri"], "owl:sameAs", lk[f"{v}_id"]))

    ins = batch.filter(pc.equal(mt, "instrument"))
    if len(ins):
        out.append(_spo(ins["work_uri"], "mo:instrument", ins["canonical_uri"]))

    if not out:
        return pa.table(
            {"subj": pa.array([], pa.string()), "pred": pa.array([], pa.string()),
             "obj": pa.array([], pa.string())}
        )
    merged = pa.concat_tables(out)
    return merged.group_by(["subj", "pred", "obj"]).aggregate([])  # in-block dedup


def finalize_triples(batch: pa.Table) -> pa.Table:
    """Add the write-partition bucket column (sha64(subj) % 64 —
    stable sha-derived hash, spec §6; runs on distinct rows only).

    Subjects repeat heavily across predicates, so the per-string hash
    runs once per DISTINCT subj (C++ dictionary encode) and per-row
    buckets come from a vectorized numpy gather."""
    import numpy as np

    subj = batch["subj"]
    if isinstance(subj, pa.ChunkedArray):
        subj = subj.combine_chunks()
    enc = subj.dictionary_encode()
    uniq_buckets = np.fromiter(
        (sha64(s) % 64 for s in enc.dictionary.to_pylist()),
        dtype=np.int32,
        count=len(enc.dictionary),
    )
    idx = enc.indices.to_numpy(zero_copy_only=False)
    bucket = pa.array(uniq_buckets[idx], type=pa.int32())
    return batch.append_column("bucket", bucket)
