"""Deterministic synthetic corpus + vocabulary generator (FIXTURES.md).

The input_hint table (repo, path, commit, lang, content) does not exist
in /root/testdata, so this module synthesizes it — seeded, so the
engine, the sequential reference oracle, tests, and the bench harness
all see byte-identical input. Skew guarantee: composers drawn
Zipf(s=1.3) over a 120-name pool headed by Bach/Mozart/Beethoven
(BASELINE.json north_star: "salting hot composers like Bach/Mozart").

Generation is shared INPUT for both implementations; it is not part of
the duplicated pipeline semantics (docs/PIPELINE_SPEC.md).
"""

from __future__ import annotations

import hashlib
import os
import unicodedata

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from . import normalize, schemas

SEED = 42

# 30 real composer names (public knowledge), diacritics included on purpose.
_REAL_COMPOSERS = [
    "Johann Sebastian Bach",
    "Wolfgang Amadeus Mozart",
    "Ludwig van Beethoven",
    "Franz Schubert",
    "Joseph Haydn",
    "Georg Friedrich Händel",
    "Antonio Vivaldi",
    "Johannes Brahms",
    "Frédéric Chopin",
    "Robert Schumann",
    "Felix Mendelssohn",
    "Franz Liszt",
    "Richard Wagner",
    "Giuseppe Verdi",
    "Pyotr Ilyich Tchaikovsky",
    "Antonín Dvořák",
    "Camille Saint-Saëns",
    "Claude Debussy",
    "Maurice Ravel",
    "Gustav Mahler",
    "Anton Bruckner",
    "Béla Bartók",
    "Igor Stravinsky",
    "Sergei Rachmaninoff",
    "Jean Sibelius",
    "Edvard Grieg",
    "Henry Purcell",
    "Claudio Monteverdi",
    "Giovanni Pierluigi da Palestrina",
    "Arcangelo Corelli",
]

_SYL_A = ["Al", "Ber", "Carl", "Dor", "Emil", "Fried", "Gott", "Hein", "Isa", "Jo"]
_SYL_B = ["bert", "hard", "mann", "rich", "wald", "helm", "fried", "mar", "lin", "bald"]
_SYL_C = ["Bach", "Berg", "Hof", "Stein", "Wald", "Brun", "Kess", "Mos", "Reich", "Tal"]
_SYL_D = ["er", "ner", "mann", "inger", "bauer", "meier", "huber", "dorf", "feld", "ski"]

_INSTRUMENTS = [
    "Violin", "Viola", "Violoncello", "Double Bass", "Flute", "Oboe",
    "Clarinet", "Bassoon", "Horn", "Trumpet", "Trombone", "Timpani",
    "Piano", "Harpsichord", "Organ", "Harp", "Guitar", "Soprano",
    "Alto", "Tenor",
]

_FORMS = ["Symphony", "Sonata", "Quartet", "Concerto", "Mass", "Overture", "Suite", "Fantasia"]
_KEYS = ["C", "D", "E", "F", "G", "A", "B", "B-flat", "E-flat", "F-sharp"]
_MODES = ["major", "minor"]

_MUSICXML_TMPL = """<score-partwise version="3.1">
  <work><work-number>W{wid}</work-number><work-title>{title}</work-title></work>
  <identification>
    <creator type="composer">{composer}</creator>
    <encoding><encoding-date>{date}</encoding-date></encoding>
  </identification>
  <part-list>
{parts}
  </part-list>
  <part id="P1">
{body}
  </part>
</score-partwise>"""

_MEI_TMPL = """<mei xmlns="http://www.music-encoding.org/ns/mei">
  <meiHead><fileDesc>
    <titleStmt><title>{title}</title>
      <composer><persName>{composer}</persName></composer>
    </titleStmt>
    <pubStmt><date isodate="{date}"/></pubStmt>
  </fileDesc>
  <workList><work><title>{title}</title><identifier>W{wid}</identifier></work></workList>
  <perfMedium><perfResList>
{perfres}
  </perfResList></perfMedium>
  </meiHead>
  <music><body><mdiv><score><section>
{body}
  </section></score></mdiv></body></music>
</mei>"""


def _measure_pool() -> list[str]:
    """64 deterministic pre-built measure blocks (~15 notes each).

    Real MusicXML/MEI scores carry the full note body (tens of KB per
    file); the extraction stages must parse past it, so the fixture
    includes it — this is what makes the parse stage realistically
    CPU-bound at bench scale."""
    steps = "CDEFGAB"
    pool = []
    rng = np.random.default_rng(SEED + 11)
    for m in range(64):
        notes = []
        for _ in range(5):
            s = steps[rng.integers(7)]
            o = int(rng.integers(2, 7))
            d = int(rng.integers(1, 17))
            notes.append(
                f"<note><pitch><step>{s}</step><octave>{o}</octave></pitch>"
                f"<duration>{d}</duration><type>quarter</type></note>"
            )
        pool.append(f'<measure number="{m}">' + "".join(notes) + "</measure>")
    return pool


def composer_pool() -> list[str]:
    """120 names: 30 real + 90 deterministic synthetic."""
    pool = list(_REAL_COMPOSERS)
    rng = np.random.default_rng(SEED + 7)
    while len(pool) < 120:
        first = _SYL_A[rng.integers(10)] + _SYL_B[rng.integers(10)]
        last = _SYL_C[rng.integers(10)] + _SYL_D[rng.integers(10)]
        name = f"{first} {last}"
        if name not in pool:
            pool.append(name)
    return pool


def life_dates(idx: int) -> tuple[int, int]:
    h = int.from_bytes(hashlib.sha256(f"life{idx}".encode()).digest()[:4], "big")
    born = 1600 + h % 280
    return born, born + 40 + h % 45


def _strip_marks(s: str) -> str:
    d = unicodedata.normalize("NFKD", s)
    return "".join(c for c in d if unicodedata.category(c) != "Mn")


def _last_first(name: str) -> str:
    parts = name.split(" ")
    if len(parts) < 2:
        return name
    return parts[-1] + ", " + " ".join(parts[:-1])


def _typo(name: str, rng: np.random.Generator) -> str:
    if len(name) < 4:
        return name
    pos = int(rng.integers(1, len(name) - 1))
    op = int(rng.integers(3))
    if op == 0:  # delete
        return name[:pos] + name[pos + 1 :]
    if op == 1:  # substitute
        c = chr(ord("a") + int(rng.integers(26)))
        return name[:pos] + c + name[pos + 1 :]
    return name[:pos - 1] + name[pos] + name[pos - 1] + name[pos + 1 :]  # transpose


def _zipf_probs(n: int, s: float = 1.3) -> np.ndarray:
    w = 1.0 / np.arange(1, n + 1) ** s
    return w / w.sum()


def _work_attrs(n_works: int, seed: int) -> dict:
    """Vectorized per-work attribute arrays (shared by ~3 rows each)."""
    pool = composer_pool()
    wrng = np.random.default_rng(seed + 1)
    w_composer = wrng.choice(len(pool), size=n_works, p=_zipf_probs(len(pool)))
    forms = wrng.integers(0, len(_FORMS), size=n_works)
    keys = wrng.integers(0, len(_KEYS), size=n_works)
    modes = wrng.integers(0, 2, size=n_works)
    nums = wrng.integers(1, 40, size=n_works)
    kinds = wrng.integers(0, 3, size=n_works)
    opus = wrng.integers(1, 200, size=n_works)
    t_instr = wrng.integers(0, len(_INSTRUMENTS), size=n_works)
    titles = []
    for w in range(n_works):
        form, key, mode = _FORMS[forms[w]], _KEYS[keys[w]], _MODES[modes[w]]
        if kinds[w] == 0:
            titles.append(f"{form} No. {nums[w]} in {key} {mode}")
        elif kinds[w] == 1:
            titles.append(f"{form} in {key} {mode}, Op. {opus[w]}")
        else:
            titles.append(f"Concerto for {_INSTRUMENTS[t_instr[w]]} in {key} {mode}")
    n_instr = wrng.integers(1, 5, size=n_works)
    flat = wrng.integers(0, len(_INSTRUMENTS), size=int(n_instr.sum()))
    offs = np.concatenate([[0], np.cumsum(n_instr)])
    instr = [
        [_INSTRUMENTS[int(x)] for x in flat[offs[w] : offs[w + 1]]] for w in range(n_works)
    ]
    return {
        "composer": w_composer,
        "titles": titles,
        "years": 1650 + wrng.integers(0, 250, size=n_works),
        "month": wrng.integers(1, 13, size=n_works),
        "day": wrng.integers(1, 29, size=n_works),
        "instr": instr,
    }


SHARD_ROWS = 10_000


def _corpus_shard(start: int, stop: int, n_works: int, w: dict, seed: int) -> pa.Table:
    """Rows [start, stop) — deterministic given (seed, start//SHARD_ROWS),
    so shards can be generated serially or in parallel with identical
    bytes. All randomness is pre-drawn as arrays (per-row rng calls were
    the old generator's bottleneck: 404s for 600k rows -> ~40s)."""
    rng = np.random.default_rng([seed, start // SHARD_ROWS])
    pool = composer_pool()
    m = stop - start
    measures = _measure_pool()
    lang_r = rng.random(m)
    variant_r = rng.random(m)
    typo_r = rng.random(m)
    case_r = rng.random(m)
    date_r = rng.random(m)
    malformed_r = rng.random(m)
    n_measures = rng.integers(8, 20, size=m)
    midx = rng.integers(0, len(measures), size=int(n_measures.sum()))
    moffs = np.concatenate([[0], np.cumsum(n_measures)])
    typo_aux = rng.random(m * 2)  # typo position + op draws

    repo, path, commit, content, langs = [], [], [], [], []
    for j in range(m):
        i = start + j
        wid = i % n_works
        cidx = int(w["composer"][wid])
        name = pool[cidx]
        r = variant_r[j]
        if r < 0.40:
            comp = name
        elif r < 0.65:
            comp = _last_first(name)
        elif r < 0.85:
            y0, y1 = life_dates(cidx)
            comp = f"{name} ({y0}-{y1})"
        else:
            comp = _strip_marks(name)
            if case_r[j] < 0.5:
                comp = comp.upper()
        if typo_r[j] < 0.05 and len(comp) >= 4:
            pos = 1 + int(typo_aux[2 * j] * (len(comp) - 2))
            op = int(typo_aux[2 * j + 1] * 3)
            if op == 0:
                comp = comp[:pos] + comp[pos + 1 :]
            elif op == 1:
                c = chr(ord("a") + int(typo_aux[2 * j + 1] * 1000) % 26)
                comp = comp[:pos] + c + comp[pos + 1 :]
            else:
                comp = comp[: pos - 1] + comp[pos] + comp[pos - 1] + comp[pos + 1 :]

        lr = lang_r[j]
        lang = "musicxml" if lr < 0.70 else ("mei" if lr < 0.95 else "txt")
        dr = date_r[j]
        if dr < 0.5:
            date = f"{w['years'][wid]:04d}-{w['month'][wid]:02d}-{w['day'][wid]:02d}"
        elif dr < 0.8:
            date = f"{w['years'][wid]:04d}"
        else:
            date = f"c. {w['years'][wid]:04d}"
        title = w["titles"][wid]
        body = "\n".join(measures[k] for k in midx[moffs[j] : moffs[j + 1]])
        if lang == "musicxml":
            parts = "\n".join(
                f'    <score-part id="P{k+1}"><part-name>{ins}</part-name></score-part>'
                for k, ins in enumerate(w["instr"][wid])
            )
            doc = _MUSICXML_TMPL.format(
                wid=wid, title=title, composer=comp, date=date, parts=parts, body=body
            )
            ext = "musicxml"
        elif lang == "mei":
            perfres = "\n".join(f"    <perfRes>{ins}</perfRes>" for ins in w["instr"][wid])
            doc = _MEI_TMPL.format(
                wid=wid, title=title, composer=comp, date=date, perfres=perfres, body=body
            )
            ext = "mei"
        else:
            doc = f"not a score: {title} by {comp}"
            ext = "txt"
        if lang != "txt" and malformed_r[j] < 0.01:  # 1% malformed
            doc = doc[: len(doc) // 2]
        repo.append(f"org{i % 50}/scores{i % 200}")
        path.append(f"scores/w{wid}/{i}.{ext}")
        commit.append(hashlib.sha256(f"commit{i}".encode()).hexdigest()[:12])
        content.append(doc)
        langs.append(lang)
    return pa.table(
        {"repo": repo, "path": path, "commit": commit, "lang": langs, "content": content},
        schema=schemas.CORPUS,
    )


def make_corpus(n_rows: int, seed: int = SEED) -> pa.Table:
    """Seeded source-repo corpus table, input_hint shape (BASELINE.json).
    Shard-deterministic: identical bytes whether shards are built
    serially here or in parallel Ray tasks (corpus_path)."""
    n_works = max(1, n_rows // 3)
    w = _work_attrs(n_works, seed)
    shards = [
        _corpus_shard(s, min(n_rows, s + SHARD_ROWS), n_works, w, seed)
        for s in range(0, n_rows, SHARD_ROWS)
    ]
    return pa.concat_tables(shards)


# ---------------------------------------------------------------------------
# vocabulary fixtures


def _unlinked(idx: int) -> bool:
    """~8% of pool composers appear in no vocabulary (recall denominator)."""
    return idx % 13 == 5


def make_vocab(seed: int = SEED) -> pa.Table:
    pool = composer_pool()
    rng = np.random.default_rng(seed + 2)
    rows: list[dict] = []

    def ent(vocab, entity_id, label, etype, aliases):
        rows.append(
            {
                "vocab": vocab,
                "entity_id": entity_id,
                "label": label,
                "norm_label": normalize.normalize_for_type(label, etype),
                "aliases": aliases,
                "entity_type": etype,
            }
        )

    for idx, name in enumerate(pool):
        if _unlinked(idx):
            continue
        dbp_slug = _strip_marks(name).replace(" ", "_")
        y0, y1 = life_dates(idx)
        aliases = [_last_first(name), _strip_marks(name), f"{name} ({y0}-{y1})"]
        parts = name.split(" ")
        if len(parts) >= 2:
            aliases.append(" ".join(p[0] + "." for p in parts[:-1]) + " " + parts[-1])
        ent("viaf", f"viaf:{10000 + idx * 7}", name, "agent", aliases[:4])
        if idx % 5 != 1:
            ent("dbpedia", f"dbpedia:{dbp_slug}", name, "agent", aliases[:3])
        if idx % 3 != 2 or idx % 5 == 1:
            ent("europeana", f"europeana:agent/{2000 + idx * 3}", name, "agent", aliases[:2])
        # distractor entities (edit distance 2-3 from the real name)
        if idx < 40:
            d = _typo(_typo(name, rng), rng)
            ent("dbpedia", f"dbpedia:{_strip_marks(d).replace(' ', '_')}", d, "agent", [])
            if idx % 2 == 0:
                d2 = _typo(_typo(_typo(name, rng), rng), rng)
                ent("viaf", f"viaf:{90000 + idx}", d2, "agent", [])

    for k, ins in enumerate(_INSTRUMENTS):
        ent("dbpedia", f"dbpedia:instr_{ins.replace(' ', '_')}", ins, "instrument", [])
        ent("europeana", f"europeana:instr/{k}", ins, "instrument", [ins.lower()])

    # work entities for a deterministic subset of work titles
    n_works_fixture = 400
    titles = _work_attrs(n_works_fixture, seed)["titles"]
    for wid in range(0, n_works_fixture, 4):
        t = titles[wid]
        ent("europeana", f"europeana:work/{wid}", t, "work", [])
        if wid % 8 == 0:
            ent("viaf", f"viaf:work{wid}", t, "work", [t.upper()])

    cols = {k: [r[k] for r in rows] for k in ("vocab", "entity_id", "label", "norm_label", "aliases", "entity_type")}
    return pa.table(cols, schema=schemas.VOCAB)


# ---------------------------------------------------------------------------
# on-disk caching (bench / tests reuse the same generated files)

SCALES = {"tiny": 2_000, "smoke": 20_000, "bench": 600_000, "sf1": 6_000_000}


def corpus_path(scale: str, root: str = "/tmp/kgray_fixtures") -> str:
    """Generate-once-and-cache the corpus parquet directory.

    Shard generation is deterministic per (seed, shard), so when a Ray
    session is live the shards are generated AND written in parallel
    tasks — identical bytes to the serial path."""
    n = SCALES[scale]
    out = os.path.join(root, f"corpus_{scale}")
    marker = os.path.join(out, "_done")
    if os.path.exists(marker):
        return out
    os.makedirs(out, exist_ok=True)
    n_works = max(1, n // 3)
    bounds = [(s, min(n, s + SHARD_ROWS)) for s in range(0, n, SHARD_ROWS)]

    use_ray = False
    try:
        import ray

        use_ray = ray.is_initialized() and len(bounds) >= 8
    except Exception:
        pass

    if use_ray:
        import ray

        w_ref = ray.put(_work_attrs(n_works, SEED))

        @ray.remote
        def gen_write(start: int, stop: int, idx: int) -> None:
            t = _corpus_shard(start, stop, n_works, ray.get(w_ref), SEED)
            pq.write_table(t, os.path.join(out, f"part-{idx:04d}.parquet"))

        ray.get([gen_write.remote(s, e, i) for i, (s, e) in enumerate(bounds)])
    else:
        w = _work_attrs(n_works, SEED)
        if len(bounds) < 4:
            tbl = pa.concat_tables(
                _corpus_shard(s, e, n_works, w, SEED) for s, e in bounds
            )
            nfiles = 4
            step = (len(tbl) + nfiles - 1) // nfiles
            for f in range(nfiles):
                pq.write_table(
                    tbl.slice(f * step, step), os.path.join(out, f"part-{f:04d}.parquet")
                )
        else:
            for i, (s, e) in enumerate(bounds):
                pq.write_table(
                    _corpus_shard(s, e, n_works, w, SEED),
                    os.path.join(out, f"part-{i:04d}.parquet"),
                )
    open(marker, "w").close()
    return out


def vocab_path(root: str = "/tmp/kgray_fixtures") -> str:
    out = os.path.join(root, "vocab.parquet")
    if not os.path.exists(out):
        os.makedirs(root, exist_ok=True)
        pq.write_table(make_vocab(), out)
    return out
