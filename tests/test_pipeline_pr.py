"""End-to-end gates (SURVEY.md §5.2/5.3): P/R ≥ 0.95 vs the independent
sequential oracle, and the per-row sha256 invariant."""

from __future__ import annotations

import pyarrow.compute as pc
import pytest

import ray.data

from kgray import pipeline


@pytest.fixture(scope="module")
def engine_triples(ray_session, tiny_corpus, vocab_file):
    with pipeline.hash_shuffle_ctx():
        corpus = ray.data.from_arrow(tiny_corpus)
        ds = pipeline.build_triples(corpus, vocab_file, concurrency=2).sort(
            ["subj", "pred", "obj"]
        )
    tbl = ds.to_pandas()
    return set(zip(tbl["subj"], tbl["pred"], tbl["obj"])), tbl


def test_precision_recall(engine_triples, oracle_result):
    ours, _ = engine_triples
    golden_tbl = oracle_result["triples"]
    golden = set(
        zip(
            golden_tbl["subj"].to_pylist(),
            golden_tbl["pred"].to_pylist(),
            golden_tbl["obj"].to_pylist(),
        )
    )
    assert len(golden) > 1000  # fixture sanity: a real triple set
    tp = len(ours & golden)
    precision = tp / max(1, len(ours))
    recall = tp / max(1, len(golden))
    # contract: >= 0.95; the spec is deterministic so we hold it to 1.0
    assert precision >= 0.95 and recall >= 0.95, (precision, recall)
    assert ours == golden, (
        f"P={precision:.4f} R={recall:.4f}; "
        f"only_ours={sorted(ours - golden)[:5]} only_golden={sorted(golden - ours)[:5]}"
    )


def test_triples_distinct_and_bucketed(engine_triples):
    _, tbl = engine_triples
    assert not tbl.duplicated(subset=["subj", "pred", "obj"]).any()
    assert set(tbl.columns) == {"subj", "pred", "obj", "bucket"}
    assert tbl["bucket"].between(0, 63).all()
    assert tbl["pred"].isin(
        ["dc:creator", "dc:title", "dcterms:date", "mo:instrument", "owl:sameAs", "edm:isRelatedTo"]
    ).all()


def test_streaming_mode_equals_phased(ray_session, engine_triples, vocab_file):
    """phased=False (fully streamed shuffle, the >object-store regime)
    must produce the same distinct triple set as the phased default
    (VERDICT next-round item 3: both modes stay tested)."""
    from kgray import fixtures

    path = fixtures.corpus_path("tiny")
    ds = pipeline.flagship(path, vocab_file, phased=False)
    tbl = ds.to_pandas()
    streamed = set(zip(tbl["subj"], tbl["pred"], tbl["obj"]))
    phased_set, _ = engine_triples
    assert streamed == phased_set


def test_choose_phased_gate(ray_session):
    """The auto gate pins only what fits the object store."""
    import ray as _ray

    store = _ray.cluster_resources().get("object_store_memory", 0)
    assert store > 0
    fits = int(0.1 * store / pipeline.TRIPLE_BYTES_PER_INPUT_ROW)
    too_big = int(store / pipeline.TRIPLE_BYTES_PER_INPUT_ROW)
    assert pipeline.choose_phased(fits) is True
    assert pipeline.choose_phased(too_big) is False


def test_phased_gate_sample_estimate(ray_session, vocab_file, tmp_path):
    """VERDICT r2 task 4: on a corpus with far denser mentions than the
    bench corpus, the constant bytes-per-row would under-estimate the
    pinned footprint (and wrongly pin it); the sampled estimate
    (extract+link+emit over a deterministic sample) catches it."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    import ray as _ray

    parts = "\n".join(
        f'<score-part id="P{i}"><part-name>Instrument Nr {i}</part-name></score-part>'
        for i in range(60)  # ~60 instrument mentions/doc vs bench ~1-3
    )
    def xml(i: int) -> str:
        # distinct work per doc, so the emitted triples are distinct
        # (the emit stage block-dedups) — the density is real
        return (
            '<score-partwise version="3.1">'
            f"<work><work-number>W{i}</work-number>"
            f"<work-title>Dense Suite {i}</work-title></work>"
            '<identification><creator type="composer">Johann Sebastian Bach</creator>'
            "<encoding><encoding-date>1720</encoding-date></encoding></identification>"
            f"<part-list>{parts}</part-list>"
            "</score-partwise>"
        )

    n = 64
    tbl = pa.table(
        {
            "repo": pa.array(["r"] * n),
            "path": pa.array([f"p{i}.musicxml" for i in range(n)]),
            "commit": pa.array(["c"] * n),
            "lang": pa.array(["musicxml"] * n),
            "content": pa.array([xml(i) for i in range(n)]),
        }
    )
    cdir = tmp_path / "dense_corpus"
    cdir.mkdir()
    pq.write_table(tbl, str(cdir / "part-0.parquet"))

    bpr = pipeline.estimate_triple_bytes_per_row(str(cdir), vocab_file)
    # dense mentions -> the honest estimate dwarfs the bench constant
    assert bpr > 3 * pipeline.TRIPLE_BYTES_PER_INPUT_ROW, bpr
    # a corpus size the constant would PIN but the sampled estimate
    # correctly refuses (its true footprint exceeds the store budget)
    store = _ray.cluster_resources()["object_store_memory"]
    rows_between = int(2 * pipeline.PHASED_MAX_STORE_FRACTION * store / bpr)
    assert pipeline.choose_phased(rows_between) is True  # constant: wrong
    assert pipeline.choose_phased(rows_between, bpr) is False  # sample: right


def test_sha_invariant(ray_session, tiny_corpus, oracle_result):
    """Engine content_sha256 equals the oracle's for 100% of rows."""
    corpus = ray.data.from_arrow(tiny_corpus)
    out = corpus.map_batches(
        lambda b: b, batch_format="pyarrow"
    )  # passthrough to exercise the Dataset path
    from kgray.stages import with_sha

    sha_tbl = out.map_batches(with_sha, batch_format="pyarrow").to_pandas()
    keys = sha_tbl["repo"] + "/" + sha_tbl["path"] + "@" + sha_tbl["commit"]
    golden = oracle_result["shas"]
    assert len(sha_tbl) == len(golden)
    mismatches = sum(
        1 for k, s in zip(keys, sha_tbl["content_sha256"]) if golden[k] != s
    )
    assert mismatches == 0


def test_salted_canonicalize_equals_combiner(ray_session, tiny_corpus, vocab_file):
    """A4 explicit salting == combiner two-phase, row for row."""
    from kgray.canonicalize import canonical_table, canonical_table_salted

    corpus = ray.data.from_arrow(tiny_corpus)
    linked = pipeline.build_linked(
        pipeline.build_mentions(corpus, with_sha=False), vocab_file
    )
    a = canonical_table(linked).to_pandas()
    linked2 = pipeline.build_linked(
        pipeline.build_mentions(ray.data.from_arrow(tiny_corpus), with_sha=False),
        vocab_file,
    )
    b = canonical_table_salted(linked2, nsalt=8).to_pandas()
    key = ["mention_type", "norm"]
    a = a.sort_values(key, ignore_index=True)[sorted(a.columns)]
    b = b.sort_values(key, ignore_index=True)[sorted(b.columns)]
    assert a.equals(b)


def test_actor_mode_linking_equals_task_mode(ray_session, tiny_corpus, vocab_file):
    """The contract's stateful actor-pool path must produce exactly the
    task-broadcast path's output (same link_transform, different
    execution mode)."""
    corpus = ray.data.from_arrow(tiny_corpus).limit(300)
    m = pipeline.build_mentions(corpus, with_sha=False)
    t = (
        pipeline.build_linked(m, vocab_file, mode="tasks")
        .to_pandas()
        .sort_values(["doc_key", "mention_type", "surface"], ignore_index=True)
    )
    corpus2 = ray.data.from_arrow(tiny_corpus).limit(300)
    m2 = pipeline.build_mentions(corpus2, with_sha=False)
    a = (
        pipeline.build_linked(m2, vocab_file, mode="actors", concurrency=2)
        .to_pandas()
        .sort_values(["doc_key", "mention_type", "surface"], ignore_index=True)
    )
    assert t.equals(a)


def test_canonical_fuzzy_matches_reference(ray_session, tiny_corpus, vocab_file, vocab_table):
    """U3 in-group fuzzy merge: engine == independent sequential
    reference, and merging actually collapses variant spellings."""
    from kgray.canonicalize import canonical_table_fuzzy
    from reference_impl import run_canonical_fuzzy

    corpus = ray.data.from_arrow(tiny_corpus)
    linked = pipeline.build_linked(
        pipeline.build_mentions(corpus, with_sha=False), vocab_file
    )
    key = ["mention_type", "block", "norm"]
    eng = (
        canonical_table_fuzzy(linked)
        .to_pandas()
        .sort_values(key, ignore_index=True)
    )
    ref = run_canonical_fuzzy(tiny_corpus, vocab_table).to_pandas()
    assert list(eng.columns) == list(ref.columns)
    assert eng.astype(str).equals(ref.astype(str)), (
        eng.compare(ref).head() if eng.shape == ref.shape else (eng.shape, ref.shape)
    )
    agents = eng[eng["mention_type"] == "agent"]
    assert (agents["n_variants"] > 1).any()  # the merge does merge
    # fewer agent canonicals than exact-norm canonicalization
    from kgray.canonicalize import canonical_table

    exact = canonical_table(linked).to_pandas()
    assert len(agents) < (exact["mention_type"] == "agent").sum()


def test_canonical_table_agrees(ray_session, tiny_corpus, vocab_file, oracle_result):
    """Engine canonicalization aggregate == oracle canonical map (spec §7)."""
    from kgray.canonicalize import canonical_table

    corpus = ray.data.from_arrow(tiny_corpus)
    linked = pipeline.build_linked(
        pipeline.build_mentions(corpus, with_sha=False), vocab_file, concurrency=2
    )
    canon = canonical_table(linked).to_pandas()
    got = {
        (r.mention_type, r.norm): r.canonical_uri
        for r in canon.itertuples()
        if r.mention_type != "date"
    }
    want = oracle_result["canonical"]
    assert got == {k: v for k, v in want.items()}
    assert (canon["n_mentions"] > 0).all()
    # skew sanity: the Zipf head (bach) must dominate
    agents = canon[canon["mention_type"] == "agent"]
    assert agents["n_mentions"].max() > 5 * agents["n_mentions"].median()
