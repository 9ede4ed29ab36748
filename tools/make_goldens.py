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


SF001 = "/root/testdata/sf0.01"


def _write(name: str, table) -> None:
    path = os.path.join(GOLDEN_DIR, f"{name}.parquet")
    if os.path.exists(path) and pq.read_table(path).equals(table):
        print(f"{name}: unchanged ({table.num_rows} rows)")
        return
    pq.write_table(table, path)
    print(f"{name}: wrote {table.num_rows} rows -> {path}")


def main() -> None:
    import numpy as np
    import pyarrow as pa

    from kgray import fixtures
    from reference_impl import (
        run_canonical,
        run_canonical_fuzzy,
        run_mentions,
        run_oracle,
        sketch,
    )

    corpus = pq.read_table(fixtures.corpus_path("smoke"))
    vocab = pq.read_table(fixtures.vocab_path())

    for name, table in [
        ("smoke_triples", run_oracle(corpus, vocab)["triples"]),
        ("smoke_canonical_fuzzy", run_canonical_fuzzy(corpus, vocab)),
        ("smoke_mentions", run_mentions(corpus)),
        ("smoke_canonical", run_canonical(corpus, vocab)),
    ]:
        _write(name, table)

    # sketch/ANN goldens: sequential references over the driver's
    # sf0.01 testdata tables (the correctness scale these oracles
    # serve; reference_impl/sketch.py docstring)
    docs = pq.read_table(f"{SF001}/documents.parquet", columns=["doc_id", "text"])
    emb = pq.read_table(f"{SF001}/embeddings.parquet", columns=["vec_id", "embedding"])
    ids = np.asarray(emb["vec_id"].to_pylist())
    queries = emb.filter(pa.array(ids % 100 == 0))
    for name, table in [
        ("sf001_dedup_minhash", sketch.run_minhash_pairs(docs)),
        ("sf001_dedup_simhash", sketch.run_simhash_pairs(docs)),
        ("sf001_ngram_topk", sketch.run_ngram_topk(docs)),
        ("sf001_knn_lsh", sketch.run_knn_lsh(emb, queries)),
        ("sf001_knn_ivf", sketch.run_knn_ivf(emb, queries)),
        ("sf001_embedding_dup_pairs", sketch.run_cosine_dup_pairs(emb)),
        ("sf001_kmeans", sketch.run_kmeans(emb)),
        ("sf001_semdedup", sketch.run_semdedup(emb)),
        ("sf001_knn_graph", sketch.run_knn_graph(emb)),
        ("sf001_bpe_tokens", sketch.run_bpe_tokens(docs)),
        ("sf001_doc_embed", sketch.run_doc_embed(docs)),
        ("sf001_compress_ratio", sketch.run_compress_ratio(docs)),
    ]:
        _write(name, table)


if __name__ == "__main__":
    main()
