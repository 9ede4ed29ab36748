"""Checkpoint/resume gate (SURVEY.md §5.7): kill after k partitions,
rerun, outputs content-identical to an uninterrupted run."""

from __future__ import annotations

import glob
import json
import os

import pandas as pd
import pyarrow.parquet as pq
import pytest


def _read_out(out_dir: str) -> pd.DataFrame:
    frames = []
    for f in sorted(glob.glob(os.path.join(out_dir, "data", "part=*", "*.parquet"))):
        df = pq.read_table(f).to_pandas()
        df["part"] = f.split("part=")[1].split("/")[0]
        frames.append(df)
    all_df = pd.concat(frames, ignore_index=True)
    return all_df.sort_values(["part", "subj", "pred", "obj"], ignore_index=True)


@pytest.fixture(scope="module")
def corpus_dir(tmp_path_factory):
    from kgray import fixtures

    return fixtures.corpus_path("tiny", root=str(tmp_path_factory.mktemp("fx")))


def test_kill_and_resume(ray_session, corpus_dir, vocab_file, tmp_path):
    from kgray import checkpoint

    full = str(tmp_path / "full")
    part = str(tmp_path / "partial")

    s_full = checkpoint.run_checkpointed(corpus_dir, vocab_file, full, num_partitions=4)
    assert len(s_full["completed"]) == 4 and not s_full["skipped"]

    # simulate a kill after 2 completed partitions
    s1 = checkpoint.run_checkpointed(
        corpus_dir, vocab_file, part, num_partitions=4, max_partitions=2
    )
    assert len(s1["completed"]) == 2
    # resume: must skip the finished ones, complete the rest
    s2 = checkpoint.run_checkpointed(corpus_dir, vocab_file, part, num_partitions=4)
    assert sorted(s2["skipped"]) == sorted(s1["completed"])
    assert sorted(s1["completed"] + s2["completed"]) == [0, 1, 2, 3]

    a, b = _read_out(full), _read_out(part)
    pd.testing.assert_frame_equal(a, b)

    # lineage sidecars present + consistent
    recs = [
        json.load(open(p))
        for p in sorted(glob.glob(os.path.join(part, "_lineage", "part-*.json")))
    ]
    assert len(recs) == 4
    assert sum(r["rows_in"] for r in recs) == 2000
    assert all(r["triples"] > 0 and len(r["content_sha_xor"]) == 16 for r in recs)
    assert all("sha_stats" in r["stage_ms"] and "pipeline_write" in r["stage_ms"] for r in recs)


def test_resume_rejects_changed_plan(ray_session, corpus_dir, vocab_file, tmp_path):
    """Resuming with a different --partitions value must fail loudly,
    not silently skip partitions of a different plan (ADVICE
    2026-08-17: plan-vs-marker validation)."""
    from kgray import checkpoint

    out = str(tmp_path / "plan")
    checkpoint.run_checkpointed(
        corpus_dir, vocab_file, out, num_partitions=4, max_partitions=1
    )
    with pytest.raises(ValueError, match="resume plan mismatch"):
        checkpoint.run_checkpointed(corpus_dir, vocab_file, out, num_partitions=2)
    # same plan still resumes fine
    s = checkpoint.run_checkpointed(corpus_dir, vocab_file, out, num_partitions=4)
    assert s["skipped"] == [0]


def test_partition_union_matches_oracle_set(ray_session, corpus_dir, vocab_file, tmp_path, oracle_result):
    """Union of per-partition distinct triples == global distinct set."""
    from kgray import checkpoint

    out = str(tmp_path / "o")
    checkpoint.run_checkpointed(corpus_dir, vocab_file, out, num_partitions=4)
    df = _read_out(out)
    ours = set(zip(df["subj"], df["pred"], df["obj"]))
    g = oracle_result["triples"]
    golden = set(zip(g["subj"].to_pylist(), g["pred"].to_pylist(), g["obj"].to_pylist()))
    assert ours == golden

    # per-partition lineage sha_xor folds to the whole-input xor
    recs = [
        json.load(open(p))
        for p in sorted(glob.glob(os.path.join(out, "_lineage", "part-*.json")))
    ]
    x = 0
    for r in recs:
        x ^= int(r["content_sha_xor"], 16)
    assert f"{x:016x}" == checkpoint.global_sha_xor(corpus_dir)


def test_cli(ray_session, tmp_path):
    """CLI via in-process main() (Ray already initialised)."""
    from kgray.run import main

    out = str(tmp_path / "cli")
    rc = main(["--scale", "tiny", "--out", out, "--partitions", "2"])
    assert rc == 0
    assert len(glob.glob(os.path.join(out, "_done", "part-*"))) == 2
