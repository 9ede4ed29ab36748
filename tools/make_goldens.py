"""Regenerate the committed smoke-scale golden parquets.

The goldens back the DuckDB oracles for the non-SQL-expressible KG
queries (`kg_triples`, `kg_mentions`, `kg_canonical`,
`kg_canonical_salted`, `kg_stats`, `kg_canonical_fuzzy` in
kgray/queries.py): they are produced by the INDEPENDENT sequential
implementation in `reference_impl/oracle.py` (different code shape from
the Ray engine — stdlib loops, its own normalize/JW/fuzzy-merge), run
over the deterministic seeded smoke fixture (20,000 rows, seed=42 —
the scale `_kg_scale` maps the driver's sf0.01 to).

    python tools/make_goldens.py

Sequential, no Ray. ~40 s. Output is bit-stable: rewrites
tests/golden/smoke_{triples,canonical_fuzzy}.parquet only if changed.
"""

from __future__ import annotations

import os
import sys

import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

GOLDEN_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests", "golden"
)


def main() -> None:
    from kgray import fixtures
    from reference_impl import (
        run_canonical,
        run_canonical_fuzzy,
        run_mentions,
        run_oracle,
    )

    corpus = pq.read_table(fixtures.corpus_path("smoke"))
    vocab = pq.read_table(fixtures.vocab_path())

    for name, table in [
        ("smoke_triples", run_oracle(corpus, vocab)["triples"]),
        ("smoke_canonical_fuzzy", run_canonical_fuzzy(corpus, vocab)),
        ("smoke_mentions", run_mentions(corpus)),
        ("smoke_canonical", run_canonical(corpus, vocab)),
    ]:
        path = os.path.join(GOLDEN_DIR, f"{name}.parquet")
        if os.path.exists(path) and pq.read_table(path).equals(table):
            print(f"{name}: unchanged ({table.num_rows} rows)")
            continue
        pq.write_table(table, path)
        print(f"{name}: wrote {table.num_rows} rows -> {path}")


if __name__ == "__main__":
    main()
