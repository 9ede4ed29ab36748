"""Property-based cross-checks of the linking semantics (SURVEY §5.5):
the engine's indexed linker must agree with the oracle's brute-force
linker on arbitrary vocabularies and mentions, and the flagship output
must be invariant to execution batching."""

from __future__ import annotations

import pyarrow as pa
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from kgray.linker import VocabIndex
from kgray.normalize import normalize_for_type
from reference_impl.oracle import _build_catalog, _link_mention

NAME = st.text(alphabet="abcdefg éß,.-()0123456789\x1f", min_size=0, max_size=18)
ETYPE = st.sampled_from(["agent", "work", "instrument"])
VOCAB = st.sampled_from(["dbpedia", "viaf", "europeana"])


@st.composite
def vocab_tables(draw):
    n = draw(st.integers(1, 8))
    rows = {
        "vocab": [], "entity_id": [], "label": [], "norm_label": [],
        "aliases": [], "entity_type": [],
    }
    for i in range(n):
        et = draw(ETYPE)
        label = draw(NAME)
        rows["vocab"].append(draw(VOCAB))
        rows["entity_id"].append(f"e{draw(st.integers(0, 20))}")
        rows["label"].append(label)
        rows["norm_label"].append(normalize_for_type(label, et))
        rows["aliases"].append(draw(st.lists(NAME, max_size=2)))
        rows["entity_type"].append(et)
    return pa.table(
        {
            "vocab": pa.array(rows["vocab"]),
            "entity_id": pa.array(rows["entity_id"]),
            "label": pa.array(rows["label"]),
            "norm_label": pa.array(rows["norm_label"]),
            "aliases": pa.array(rows["aliases"], type=pa.list_(pa.string())),
            "entity_type": pa.array(rows["entity_type"]),
        }
    )


@given(vocab_tables(), st.lists(st.tuples(ETYPE, NAME), min_size=1, max_size=6))
@settings(max_examples=150, deadline=None)
def test_engine_linker_equals_oracle_linker(vocab, mentions):
    index = VocabIndex(vocab)
    catalog = _build_catalog(vocab)
    memo: dict = {}
    for et, surface in mentions:
        norm = normalize_for_type(surface, et)
        got = index.link(et, norm)
        want = _link_mention(et, norm, catalog, memo)
        assert got["canonical_uri"] == want["canonical"], (et, norm)
        assert got["method"] == want["method"], (et, norm)
        got_links = {v: lk for v, lk in got["links"].items() if lk is not None}
        assert set(got_links) == set(want["links"]), (et, norm)
        for v in got_links:
            assert got_links[v][0] == want["links"][v][0], (et, norm, v)
            assert got_links[v][1] == want["links"][v][1], (et, norm, v)


@pytest.mark.parametrize("batch_size", [64, 4096])
def test_flagship_batch_size_invariant(ray_session, tiny_corpus, vocab_file, batch_size):
    """Triples must not depend on how rows are batched through the
    linker (memoization and dictionary-encode are per-batch)."""
    import ray.data

    from kgray import pipeline

    with pipeline.hash_shuffle_ctx():
        corpus = ray.data.from_arrow(tiny_corpus.slice(0, 400))
        mentions = pipeline.build_mentions(corpus, with_sha=False)
        # actors mode so batch_size actually controls the batching
        raw = pipeline.build_linked(
            mentions, vocab_file, batch_size=batch_size, concurrency=2,
            emit=True, mode="actors",
        )
        ds = pipeline.distinct_triples(raw)
    got = set(map(tuple, ds.to_pandas()[["subj", "pred", "obj"]].itertuples(index=False)))
    if not hasattr(test_flagship_batch_size_invariant, "_ref"):
        test_flagship_batch_size_invariant._ref = got
    assert got == test_flagship_batch_size_invariant._ref
