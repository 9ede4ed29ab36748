"""Flagship KG-construction pipeline assembly (SURVEY.md §3.3).

read_parquet → [sha invariant] → parse/extract mentions → Linker actor
pool → triples → global distinct → partitioned Parquet. All stages are
lazy Dataset transforms; the streaming executor pipelines blocks with
backpressure — nothing materializes the full dataset.
"""

from __future__ import annotations

import ray.data
from ray.data import Dataset
from ray.data.aggregate import Count

from . import stages
from .linker import Linker

CORPUS_COLUMNS = ["repo", "path", "commit", "lang", "content"]


def read_corpus(path: str, override_num_blocks: int | None = None) -> Dataset:
    """S1: column-pruned parquet read of the source-repo corpus."""
    kw = {}
    if override_num_blocks is not None:
        kw["override_num_blocks"] = override_num_blocks
    return ray.data.read_parquet(path, columns=CORPUS_COLUMNS, **kw)


def build_mentions(corpus: Dataset, with_sha: bool = True) -> Dataset:
    """M1..M7: corpus -> normalized mention rows (narrow; content dropped)."""
    ds = corpus
    if with_sha:
        ds = ds.map_batches(stages.with_sha, batch_format="pyarrow")
    return ds.map_batches(stages.extract_mentions, batch_format="pyarrow")


def build_linked(
    mentions: Dataset,
    vocab_path: str,
    *,
    batch_size: int = 4096,
    concurrency=(2, 8),
) -> Dataset:
    """L1: entity linking, stateful actor pool (vocab index built once
    per actor in __init__)."""
    return mentions.map_batches(
        Linker,
        fn_constructor_kwargs={"vocab_path": vocab_path},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
        num_cpus=1,
    )


def distinct_triples(raw: Dataset) -> Dataset:
    """A5: exact global distinct on (subj,pred,obj).

    Vectorized hash aggregation keyed on the narrow stable spo64 hash
    plus the strings themselves (exact even under 64-bit collisions);
    no per-group Python. Rows were already batch-deduped upstream.
    """
    return (
        raw.groupby(["spo64", "subj", "pred", "obj"])
        .aggregate(Count(alias_name="_n"))
        .drop_columns(["_n"])
        .map_batches(stages.finalize_triples, batch_format="pyarrow")
    )


def build_triples(
    corpus: Dataset,
    vocab_path: str,
    *,
    batch_size: int = 4096,
    concurrency=(2, 8),
    with_sha: bool = True,
) -> Dataset:
    """Full flagship: corpus -> distinct (subj, pred, obj, bucket)."""
    mentions = build_mentions(corpus, with_sha=with_sha)
    linked = build_linked(
        mentions, vocab_path, batch_size=batch_size, concurrency=concurrency
    )
    raw = linked.map_batches(stages.emit_triples, batch_format="pyarrow")
    return distinct_triples(raw)


def write_triples(triples: Dataset, out_dir: str) -> None:
    """S3: partitioned parquet sink (bucket = sha64(subj) % 64)."""
    triples.write_parquet(out_dir, partition_cols=["bucket"])
