"""Multimodal binary-column plumbing (task brief: image/audio/video as
opaque `binary` columns with typed metadata; decode / feature-extract
as actor-pool map_batches stages).

The container has no image/audio libraries, so REAL decode is stubbed
behind `NotImplementedError` — but the Ray-side plumbing is real and
tested: binary columns through zero-copy Arrow batches, small
batch_size for wide rows, a stateful actor whose "model" loads once in
__init__, list<float> feature output.

Fixture format ("KGIM", deterministic fake image): 16-byte header
  magic(4) | width(4, BE) | height(4, BE) | channels(4, BE)
followed by width*height*channels payload bytes (seeded).
"""

from __future__ import annotations

import hashlib
import struct

import numpy as np
import pyarrow as pa

from ray.data import Dataset

MAGIC = b"KGIM"
FEAT_DIM = 32


def make_image_table(n: int, seed: int = 42) -> pa.Table:
    """Deterministic fake-image fixture table
    (img_id, image: binary, format, width, height)."""
    rng = np.random.default_rng(seed)
    ids, blobs, fmts, ws, hs = [], [], [], [], []
    for i in range(n):
        w = int(rng.integers(8, 33))
        h = int(rng.integers(8, 33))
        c = 3
        payload = rng.integers(0, 256, size=w * h * c, dtype=np.uint8).tobytes()
        blob = MAGIC + struct.pack(">III", w, h, c) + payload
        ids.append(i)
        blobs.append(blob)
        fmts.append("kgim")
        ws.append(w)
        hs.append(h)
    return pa.table(
        {
            "img_id": pa.array(ids, type=pa.int64()),
            "image": pa.array(blobs, type=pa.binary()),
            "format": pa.array(fmts, type=pa.string()),
            "width": pa.array(ws, type=pa.int32()),
            "height": pa.array(hs, type=pa.int32()),
        }
    )


def decode_image(blob: bytes, fmt: str) -> np.ndarray:
    """Decode a binary image payload to an (h, w, c) uint8 array.

    Only the deterministic fixture format is implemented; real codecs
    (jpeg/png/...) need libraries absent from this container."""
    if fmt == "kgim" and blob[:4] == MAGIC:
        w, h, c = struct.unpack(">III", blob[4:16])
        return np.frombuffer(blob[16 : 16 + w * h * c], dtype=np.uint8).reshape(h, w, c)
    raise NotImplementedError(
        f"decode for format {fmt!r} requires an image library not present "
        "in this container (PIL/cv2); plug one in here"
    )


class ImageFeaturizer:
    """Actor-pool stage: binary image batch -> feature vectors.

    __init__ "loads the model" once per actor (here: a seeded random
    projection standing in for a real vision encoder); __call__
    decodes + pools + projects per batch. Use a SMALL batch_size —
    rows are wide (binary payloads), so batch bytes = batch_size x
    payload, and that times pool concurrency must fit worker heaps.
    """

    def __init__(self, feat_dim: int = FEAT_DIM, seed: int = 0):
        rng = np.random.default_rng(seed)
        self.proj = rng.standard_normal((3 * 8, feat_dim))  # channel x 8-bin hist -> feat

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch["img_id"]
        blobs = batch["image"].to_pylist()
        fmts = batch["format"].to_pylist()
        feats, ok = [], []
        for blob, fmt in zip(blobs, fmts):
            try:
                img = decode_image(blob, fmt)
            except NotImplementedError:
                feats.append([0.0] * self.proj.shape[1])
                ok.append(False)
                continue
            hist = np.stack(
                [np.histogram(img[..., ch], bins=8, range=(0, 256))[0] for ch in range(img.shape[2])]
            ).astype(np.float64)
            hist /= max(1.0, hist.sum())
            feats.append((hist.reshape(-1) @ self.proj).round(6).tolist())
            ok.append(True)
        return pa.table(
            {
                "img_id": ids,
                "feature": pa.array(feats, type=pa.list_(pa.float64())),
                "decode_ok": pa.array(ok, type=pa.bool_()),
            }
        )


def expected_features_table(n: int, seed: int = 42, feat_dim: int = FEAT_DIM) -> pa.Table:
    """Independent sequential oracle for `queries.q_multimodal_features`
    (gives the query a DuckDB oracle via a written expected parquet —
    VERDICT r2 task 7). Shares ONLY the fixture generator with the
    engine path; header parse (int.from_bytes, not struct), histogram
    (bincount over strided channel slices, not np.histogram) and
    projection (einsum, not @) are re-implemented with different code
    shape so an engine bug can't cancel out. Columns/types match the
    engine result exactly."""
    src = make_image_table(n, seed)
    rng = np.random.default_rng(0)  # ImageFeaturizer's seeded "model"
    proj = rng.standard_normal((3 * 8, feat_dim))
    pw, ph, hok, pb, dok, fn = [], [], [], [], [], []
    for i in range(n):
        blob = src["image"][i].as_py()
        ok = bool(blob) and blob[:4] == MAGIC
        hok.append(ok)
        pb.append(len(blob) - 16 if blob else 0)
        if not ok:
            pw.append(None)
            ph.append(None)
            dok.append(False)
            fn.append(0.0)
            continue
        w = int.from_bytes(blob[4:8], "big")
        h = int.from_bytes(blob[8:12], "big")
        c = int.from_bytes(blob[12:16], "big")
        pw.append(w)
        ph.append(h)
        payload = np.frombuffer(blob[16 : 16 + w * h * c], dtype=np.uint8)
        hist = np.zeros((c, 8), dtype=np.float64)
        for ch in range(c):
            hist[ch] = np.bincount(payload[ch::c] >> 5, minlength=8)
        hist /= max(1.0, hist.sum())
        feat = np.round(np.einsum("i,ij->j", hist.reshape(-1), proj), 6)
        dok.append(True)
        fn.append(round(float(np.linalg.norm(feat)), 4))
    return pa.table(
        {
            "img_id": pa.array(list(range(n)), type=pa.int64()),
            "parsed_width": pa.array(pw, type=pa.int32()),
            "parsed_height": pa.array(ph, type=pa.int32()),
            "header_ok": pa.array(hok, type=pa.bool_()),
            "payload_bytes": pa.array(pb, type=pa.int64()),
            "decode_ok": pa.array(dok, type=pa.bool_()),
            "feat_norm": pa.array(fn, type=pa.float64()),
        }
    )


def featurize_images(ds: Dataset, *, batch_size: int = 64, concurrency=(1, 4)) -> Dataset:
    """The multimodal pattern: stateful actor pool, small batches for
    wide binary rows, typed list<float> output."""
    return ds.map_batches(
        ImageFeaturizer,
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
        num_cpus=1,
    )


def image_metadata(ds: Dataset) -> Dataset:
    """Parse typed metadata out of the binary header per batch
    (vectorizable header peek — no full decode)."""

    def f(batch: pa.Table) -> pa.Table:
        ws, hs, ok = [], [], []
        for blob in batch["image"].to_pylist():
            if blob and blob[:4] == MAGIC:
                w, h, _ = struct.unpack(">III", blob[4:16])
                ws.append(w)
                hs.append(h)
                ok.append(True)
            else:
                ws.append(None)
                hs.append(None)
                ok.append(False)
        return pa.table(
            {
                "img_id": batch["img_id"],
                "parsed_width": pa.array(ws, type=pa.int32()),
                "parsed_height": pa.array(hs, type=pa.int32()),
                "header_ok": pa.array(ok, type=pa.bool_()),
                "payload_bytes": pa.array(
                    [len(b) - 16 if b else 0 for b in batch["image"].to_pylist()],
                    type=pa.int64(),
                ),
            }
        )

    return ds.map_batches(f, batch_format="pyarrow")
