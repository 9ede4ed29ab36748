"""Resumable partitioned execution with per-partition lineage
(SURVEY.md §4.4, BASELINE.json north_star: "Every partition emits
lineage records and stage metrics to a checkpoint store so a killed
run resumes from the last completed partition").

Layout under `out/`:
    data/part=<i>/*.parquet   triples of input-partition i (sorted)
    _lineage/part-<i>.json    {part_id, files, rows_in, triples,
                               content_sha_xor, stage_ms}
    _done/part-<i>            atomic completion marker (written last)

A partition = a contiguous slice of the sorted input file list, so
the plan is stable across runs. Each partition runs the normal Ray
Data pipeline (parallelism comes from the partition's many blocks);
resume = skip partitions whose done-marker exists. Output is
content-deterministic: per-partition triples are globally sorted by
(subj, pred, obj) before writing. Rerunning a killed job yields an
identical triple multiset per partition (verified in tests).

The per-partition distinct equals a global distinct as a SET: dedup
only removes exact duplicates, so union-of-partition-distinct ==
global-distinct set (duplicates across partitions are exact rows; a
downstream global dedup pass is `pipeline.distinct_triples` if a
single exact multiset is required).
"""

from __future__ import annotations

import glob
import json
import os
import shutil
import time

import pyarrow as pa
import pyarrow.parquet as pq

import ray.data

from . import pipeline
from .hashing import sha64


def plan_partitions(input_path: str, num_partitions: int) -> list[list[str]]:
    files = sorted(glob.glob(os.path.join(input_path, "*.parquet")))
    if not files:
        raise FileNotFoundError(f"no parquet files under {input_path}")
    n = min(num_partitions, len(files))
    total = len(files)
    # balanced contiguous slices; every partition non-empty (n <= total)
    return [files[i * total // n : (i + 1) * total // n] for i in range(n)]


def _sha_stats_batch(batch: pa.Table) -> pa.Table:
    """Per-batch partial: row count + xor of sha64(content)."""
    import hashlib

    x = 0
    vals = batch["content"].to_pylist()
    for v in vals:
        if v is not None:
            x ^= int.from_bytes(hashlib.sha256(v.encode("utf-8")).digest()[:8], "big")
    return pa.table({"n": pa.array([len(vals)], type=pa.int64()),
                     "x": pa.array([x - (1 << 63)], type=pa.int64())})


def _partition_stats(files: list[str]) -> tuple[int, str]:
    ds = ray.data.read_parquet(files, columns=["content"])
    parts = ds.map_batches(_sha_stats_batch, batch_format="pyarrow").take_all()
    rows = sum(p["n"] for p in parts)
    x = 0
    for p in parts:
        x ^= p["x"] + (1 << 63)
    return rows, f"{x:016x}"


def run_partition(
    part_id: int,
    files: list[str],
    vocab_path: str,
    out_dir: str,
    *,
    link_batch_size: int = 4096,
    link_concurrency=None,
) -> dict:
    t0 = time.monotonic()
    rows_in, sha_xor = _partition_stats(files)
    t_sha = time.monotonic()

    # size-gate the phased shuffle per partition (same rule as
    # pipeline.flagship: pin the narrow triples only when they fit)
    part_rows = sum(pq.read_metadata(f).num_rows for f in files)
    with pipeline.hash_shuffle_ctx():
        # the whole plan (read included) must be built under the
        # hash-shuffle context — see pipeline.flagship
        corpus = ray.data.read_parquet(files, columns=pipeline.CORPUS_COLUMNS)
        triples = pipeline.build_triples(
            corpus,
            vocab_path,
            batch_size=link_batch_size,
            concurrency=link_concurrency,
            with_sha=False,  # invariant accounted by the sha_xor stats pass
            phased=pipeline.choose_phased(part_rows),
        ).sort(["subj", "pred", "obj"])

    final_dir = os.path.join(out_dir, "data", f"part={part_id}")
    tmp_dir = os.path.join(out_dir, "_tmp", f"part-{part_id}-{os.getpid()}")
    shutil.rmtree(tmp_dir, ignore_errors=True)
    os.makedirs(tmp_dir, exist_ok=True)
    triples.write_parquet(tmp_dir)
    shutil.rmtree(final_dir, ignore_errors=True)
    os.makedirs(os.path.dirname(final_dir), exist_ok=True)
    os.replace(tmp_dir, final_dir)
    t_write = time.monotonic()

    n_triples = 0
    for f in glob.glob(os.path.join(final_dir, "*.parquet")):
        n_triples += pq.read_metadata(f).num_rows

    return {
        "part_id": part_id,
        "files": [os.path.basename(f) for f in files],
        "rows_in": rows_in,
        "triples": n_triples,
        "content_sha_xor": sha_xor,
        "stage_ms": {
            "sha_stats": round((t_sha - t0) * 1000, 1),
            "pipeline_write": round((t_write - t_sha) * 1000, 1),
        },
    }


def run_checkpointed(
    input_path: str,
    vocab_path: str,
    out_dir: str,
    num_partitions: int = 16,
    *,
    resume: bool = True,
    max_partitions: int | None = None,
    link_batch_size: int = 4096,
    link_concurrency=None,
) -> dict:
    """Run the flagship pipeline partition-by-partition with resume.

    Returns a summary dict {completed, skipped, triples, rows_in}.
    """
    parts = plan_partitions(input_path, num_partitions)
    done_dir = os.path.join(out_dir, "_done")
    lin_dir = os.path.join(out_dir, "_lineage")
    os.makedirs(done_dir, exist_ok=True)
    os.makedirs(lin_dir, exist_ok=True)

    completed, skipped = [], []
    for pid, files in enumerate(parts):
        marker = os.path.join(done_dir, f"part-{pid}")
        if resume and os.path.exists(marker):
            # a done-marker is only valid for the SAME plan: compare
            # the current slice's file list against the lineage record
            # the marker was written for. Resuming with a different
            # --partitions value or a changed input dir must fail
            # loudly, not silently produce a wrong union.
            lp = os.path.join(lin_dir, f"part-{pid}.json")
            planned = [os.path.basename(f) for f in files]
            recorded = rec_rows = None
            if os.path.exists(lp):
                with open(lp) as f:
                    rec = json.load(f)
                recorded, rec_rows = rec.get("files"), rec.get("rows_in")
            if recorded != planned:
                raise ValueError(
                    f"resume plan mismatch for partition {pid}: checkpoint was "
                    f"written for files={recorded} but the current plan slices "
                    f"files={planned} (different --partitions value or input "
                    f"dir?). Use a fresh --out directory, or delete "
                    f"{done_dir} to recompute everything."
                )
            # basenames alone can't catch a REGENERATED input dir
            # (same names, different rows) — also compare the recorded
            # row count against the current files' parquet footers
            # (metadata-only, no data read; ADVICE r2)
            cur_rows = sum(pq.read_metadata(f).num_rows for f in files)
            if rec_rows is not None and rec_rows != cur_rows:
                raise ValueError(
                    f"resume content mismatch for partition {pid}: checkpoint "
                    f"recorded rows_in={rec_rows} but the current input files "
                    f"hold {cur_rows} rows — the input directory was "
                    f"regenerated since the checkpoint. Use a fresh --out "
                    f"directory, or delete {done_dir} to recompute."
                )
            skipped.append(pid)
            continue
        lineage = run_partition(
            pid, files, vocab_path, out_dir,
            link_batch_size=link_batch_size, link_concurrency=link_concurrency,
        )
        lin_tmp = os.path.join(lin_dir, f".part-{pid}.tmp")
        with open(lin_tmp, "w") as f:
            json.dump(lineage, f, indent=1)
        os.replace(lin_tmp, os.path.join(lin_dir, f"part-{pid}.json"))
        with open(marker, "w") as f:
            f.write("ok")
        completed.append(pid)
        if max_partitions is not None and len(completed) >= max_partitions:
            break

    total_triples = total_rows = 0
    for pid in range(len(parts)):
        lp = os.path.join(lin_dir, f"part-{pid}.json")
        if os.path.exists(lp):
            with open(lp) as f:
                rec = json.load(f)
            total_triples += rec["triples"]
            total_rows += rec["rows_in"]
    return {
        "num_partitions": len(parts),
        "completed": completed,
        "skipped": skipped,
        "triples": total_triples,
        "rows_in": total_rows,
    }


def global_sha_xor(input_path: str) -> str:
    """Whole-input xor of sha64(content) — the cheap cross-run
    invariant check (matches xor of all partition lineage values)."""
    rows, x = _partition_stats(sorted(glob.glob(os.path.join(input_path, "*.parquet"))))
    return x
