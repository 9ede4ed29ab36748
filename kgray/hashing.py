"""Stable hashing (SURVEY.md §2 F7/M1).

Never Python ``hash()`` — it is salted per process and would make
bucket assignment nondeterministic across workers. Everything here is
sha256-derived and byte-stable.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa


def sha256_hex(s: str) -> str:
    return hashlib.sha256(s.encode("utf-8")).hexdigest()


def sha64(s: str) -> int:
    """Unsigned 64-bit stable hash: first 8 bytes of sha256 (spec §6)."""
    return int.from_bytes(hashlib.sha256(s.encode("utf-8")).digest()[:8], "big")


def sha64_signed(s: str) -> int:
    """sha64 folded into int64 range (for Arrow int64 columns)."""
    return sha64(s) - (1 << 63)


def bucket_of(s: str, n: int = 64) -> int:
    return sha64(s) % n


def sha256_column(col: pa.Array) -> pa.Array:
    """Vectorized-ish per-row sha256 hex of a string column (M1)."""
    out = [None if v is None else hashlib.sha256(v.encode("utf-8")).hexdigest() for v in col.to_pylist()]
    return pa.array(out, type=pa.string())


def bucket_column(col: pa.Array, n: int = 64) -> pa.Array:
    vals = col.to_pylist()
    out = np.empty(len(vals), dtype=np.int32)
    for i, v in enumerate(vals):
        out[i] = 0 if v is None else sha64(v) % n
    return pa.array(out, type=pa.int32())
