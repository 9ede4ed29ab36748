"""Pytest fixtures: ONE Ray session per test session (driver contract)."""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.fixture(scope="session")
def ray_session():
    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=4,
            include_dashboard=False,
            ignore_reinit_error=True,
            logging_level="ERROR",
        )
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    yield
    ray.shutdown()


@pytest.fixture(scope="session")
def tiny_corpus():
    from kgray import fixtures

    return fixtures.make_corpus(fixtures.SCALES["tiny"])


@pytest.fixture(scope="session")
def vocab_table():
    from kgray import fixtures

    return fixtures.make_vocab()


@pytest.fixture(scope="session")
def vocab_file(vocab_table, tmp_path_factory):
    import pyarrow.parquet as pq

    p = tmp_path_factory.mktemp("vocab") / "vocab.parquet"
    pq.write_table(vocab_table, str(p))
    return str(p)


@pytest.fixture(scope="session")
def oracle_result(tiny_corpus, vocab_table):
    from reference_impl import run_oracle

    return run_oracle(tiny_corpus, vocab_table)
