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


def queries() -> dict[str, Callable[[str], Any]]:
    """One entry per implemented operator/pipeline from SURVEY.md §2."""
    from kgray import queries as q

    return q.QUERIES


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for each SQL-expressible query."""
    from kgray import queries as q

    # the multimodal oracle reads an expected parquet produced by an
    # independent sequential implementation — write it now so the SQL
    # is runnable whenever the driver holds it
    q.write_multimodal_expected()
    q.write_video_expected()
    return q.ORACLE_SQL
