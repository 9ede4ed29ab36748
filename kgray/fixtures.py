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


def composer_surface(name: str, idx: int, rng: np.random.Generator) -> str:
    r = rng.random()
    if r < 0.40:
        s = name
    elif r < 0.65:
        s = _last_first(name)
    elif r < 0.85:
        y0, y1 = life_dates(idx)
        s = f"{name} ({y0}-{y1})"
    else:
        s = _strip_marks(name)
        if rng.random() < 0.5:
            s = s.upper()
    if rng.random() < 0.05:
        s = _typo(s, rng)
    return s


def _zipf_probs(n: int, s: float = 1.3) -> np.ndarray:
    w = 1.0 / np.arange(1, n + 1) ** s
    return w / w.sum()


def _work_title(wid: int, rng: np.random.Generator) -> str:
    form = _FORMS[int(rng.integers(len(_FORMS)))]
    key = _KEYS[int(rng.integers(len(_KEYS)))]
    mode = _MODES[int(rng.integers(2))]
    n = int(rng.integers(1, 40))
    kind = int(rng.integers(3))
    if kind == 0:
        return f"{form} No. {n} in {key} {mode}"
    if kind == 1:
        op = int(rng.integers(1, 200))
        return f"{form} in {key} {mode}, Op. {op}"
    instr = _INSTRUMENTS[int(rng.integers(len(_INSTRUMENTS)))]
    return f"Concerto for {instr} in {key} {mode}"


def make_corpus(n_rows: int, seed: int = SEED) -> pa.Table:
    """Seeded source-repo corpus table, input_hint shape (BASELINE.json)."""
    rng = np.random.default_rng(seed)
    pool = composer_pool()
    probs = _zipf_probs(len(pool))
    n_works = max(1, n_rows // 3)

    # per-work attributes (work identity shared by ~3 rows)
    wrng = np.random.default_rng(seed + 1)
    w_composer = wrng.choice(len(pool), size=n_works, p=probs)
    w_titles = [_work_title(w, wrng) for w in range(n_works)]
    w_years = 1650 + wrng.integers(0, 250, size=n_works)
    w_month = wrng.integers(1, 13, size=n_works)
    w_day = wrng.integers(1, 29, size=n_works)
    w_n_instr = wrng.integers(1, 5, size=n_works)
    w_instr = [
        [_INSTRUMENTS[int(x)] for x in wrng.integers(0, len(_INSTRUMENTS), size=int(k))]
        for k in w_n_instr
    ]

    langs = rng.choice(["musicxml", "mei", "txt"], size=n_rows, p=[0.70, 0.25, 0.05])
    measures = _measure_pool()
    n_measures = rng.integers(8, 20, size=n_rows)
    repo, path, commit, content = [], [], [], []
    for i in range(n_rows):
        wid = i % n_works
        cidx = int(w_composer[wid])
        lang = langs[i]
        comp = composer_surface(pool[cidx], cidx, rng)
        body = "\n".join(
            measures[k] for k in rng.integers(0, len(measures), size=int(n_measures[i]))
        )
        dr = rng.random()
        if dr < 0.5:
            date = f"{w_years[wid]:04d}-{w_month[wid]:02d}-{w_day[wid]:02d}"
        elif dr < 0.8:
            date = f"{w_years[wid]:04d}"
        else:
            date = f"c. {w_years[wid]:04d}"
        title = w_titles[wid]
        if lang == "musicxml":
            parts = "\n".join(
                f'    <score-part id="P{k+1}"><part-name>{ins}</part-name></score-part>'
                for k, ins in enumerate(w_instr[wid])
            )
            body = _MUSICXML_TMPL.format(
                wid=wid, title=title, composer=comp, date=date, parts=parts, body=body
            )
            ext = "musicxml"
        elif lang == "mei":
            perfres = "\n".join(f"    <perfRes>{ins}</perfRes>" for ins in w_instr[wid])
            body = _MEI_TMPL.format(
                wid=wid, title=title, composer=comp, date=date, perfres=perfres, body=body
            )
            ext = "mei"
        else:
            body = f"not a score: {title} by {comp}"
            ext = "txt"
        if lang != "txt" and rng.random() < 0.01:  # 1% malformed
            body = body[: len(body) // 2]
        repo.append(f"org{i % 50}/scores{i % 200}")
        path.append(f"scores/w{wid}/{i}.{ext}")
        commit.append(hashlib.sha256(f"commit{i}".encode()).hexdigest()[:12])
        content.append(body)
    return pa.table(
        {"repo": repo, "path": path, "commit": commit, "lang": langs.tolist(), "content": content},
        schema=schemas.CORPUS,
    )


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
    wrng = np.random.default_rng(seed + 1)
    n_works_fixture = 400
    _ = wrng.choice(len(pool), size=n_works_fixture, p=_zipf_probs(len(pool)))  # keep stream aligned
    titles = [_work_title(w, wrng) for w in range(n_works_fixture)]
    for wid in range(0, n_works_fixture, 4):
        t = titles[wid]
        ent("europeana", f"europeana:work/{wid}", t, "work", [])
        if wid % 8 == 0:
            ent("viaf", f"viaf:work{wid}", t, "work", [t.upper()])

    cols = {k: [r[k] for r in rows] for k in ("vocab", "entity_id", "label", "norm_label", "aliases", "entity_type")}
    return pa.table(cols, schema=schemas.VOCAB)


# ---------------------------------------------------------------------------
# on-disk caching (bench / tests reuse the same generated files)

SCALES = {"tiny": 2_000, "smoke": 20_000, "bench": 600_000}


def corpus_path(scale: str, root: str = "/tmp/kgray_fixtures") -> str:
    n = SCALES[scale]
    out = os.path.join(root, f"corpus_{scale}")
    marker = os.path.join(out, "_done")
    if not os.path.exists(marker):
        os.makedirs(out, exist_ok=True)
        tbl = make_corpus(n)
        nfiles = max(4, n // 10_000)
        step = (len(tbl) + nfiles - 1) // nfiles
        for f in range(nfiles):
            pq.write_table(tbl.slice(f * step, step), os.path.join(out, f"part-{f:04d}.parquet"))
        open(marker, "w").close()
    return out


def vocab_path(root: str = "/tmp/kgray_fixtures") -> str:
    out = os.path.join(root, "vocab.parquet")
    if not os.path.exists(out):
        os.makedirs(root, exist_ok=True)
        pq.write_table(make_vocab(), out)
    return out
