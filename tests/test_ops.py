"""Direct ops-level tests (most operators are covered end-to-end via
the driver-sim in test_queries.py; these cover properties the SQL
compare can't express)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray.data


def test_seeded_sample_layout_independent(ray_session):
    """O3 scale form: the hash sample keeps the same KEY SET whatever
    the block layout, unlike random_sample (and matches the exact
    integer-threshold spec)."""
    from kgray import ops

    keys = pa.table({"k": pa.array(range(10_000), type=pa.int64())})
    one = ray.data.from_arrow(keys)
    many = ray.data.from_arrow(keys).repartition(17)
    s1 = sorted(ops.seeded_sample(one, "k").to_pandas()["k"])
    s2 = sorted(ops.seeded_sample(many, "k").to_pandas()["k"])
    assert s1 == s2 and 300 < len(s1) < 700  # ~5% of 10k
    # spec check vs the numpy kernel directly
    h = ops._mix64(np.arange(10_000, dtype=np.uint64) ^ np.uint64(42))
    want = sorted(np.flatnonzero(h < np.uint64((1 << 64) // 20)).tolist())
    assert s1 == want
