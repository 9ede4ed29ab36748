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


PNG_SIG = b"\x89PNG\r\n\x1a\n"
_PNG_CHANNELS = {0: 1, 2: 3, 6: 4}  # gray / RGB / RGBA (8-bit)


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa_, pb, pc_ = abs(p - a), abs(p - b), abs(p - c)
    if pa_ <= pb and pa_ <= pc_:
        return a
    return b if pb <= pc_ else c


def _png_unfilter(raw: bytes, h: int, w: int, c: int) -> np.ndarray:
    """Reverse the per-scanline PNG filters (types 0-4: None, Sub, Up,
    Average, Paeth; spec §9 'Filtering'). None/Up are vectorized; the
    Sub/Average/Paeth recurrences are inherently sequential along the
    scanline (each byte depends on the reconstructed byte bpp to its
    left), so those run a per-byte loop — fixture-scale images only."""
    stride = w * c
    if len(raw) != h * (stride + 1):
        raise ValueError("PNG: decompressed length mismatch")
    out = np.zeros((h, stride), dtype=np.uint8)
    pos = 0
    for y in range(h):
        ft = raw[pos]
        pos += 1
        line = np.frombuffer(raw, np.uint8, stride, pos).astype(np.int32)
        pos += stride
        prev = out[y - 1].astype(np.int32) if y else np.zeros(stride, np.int32)
        if ft == 0:
            cur = line
        elif ft == 2:  # Up
            cur = (line + prev) & 0xFF
        elif ft == 1:  # Sub
            cur = line.copy()
            for x in range(c, stride):
                cur[x] = (cur[x] + cur[x - c]) & 0xFF
        elif ft == 3:  # Average
            cur = line.copy()
            for x in range(stride):
                a = int(cur[x - c]) if x >= c else 0
                cur[x] = (cur[x] + ((a + int(prev[x])) >> 1)) & 0xFF
        elif ft == 4:  # Paeth
            cur = line.copy()
            for x in range(stride):
                a = int(cur[x - c]) if x >= c else 0
                cc = int(prev[x - c]) if x >= c else 0
                cur[x] = (cur[x] + _paeth(a, int(prev[x]), cc)) & 0xFF
        else:
            raise ValueError(f"PNG: unknown filter type {ft}")
        out[y] = cur.astype(np.uint8)
    return out.reshape(h, w, c)


def decode_png(blob: bytes) -> np.ndarray:
    """Pure-stdlib PNG decode (zlib inflate + filter reversal) to an
    (h, w, c) uint8 array — closes the 'real codec' stub for the most
    common format without new dependencies. Supports the baseline
    profile: 8-bit depth, color types 0/2/6 (gray/RGB/RGBA),
    non-interlaced; anything else raises NotImplementedError (palette,
    16-bit, Adam7), malformed bytes raise ValueError."""
    import zlib

    if blob[:8] != PNG_SIG:
        raise ValueError("PNG: bad signature")
    pos, ihdr, idat = 8, None, []
    while pos + 8 <= len(blob):
        ln = int.from_bytes(blob[pos : pos + 4], "big")
        tag = blob[pos + 4 : pos + 8]
        data = blob[pos + 8 : pos + 8 + ln]
        if len(data) != ln:
            raise ValueError("PNG: truncated chunk")
        pos += 12 + ln  # length + tag + data + crc
        if tag == b"IHDR":
            ihdr = data
        elif tag == b"IDAT":
            idat.append(data)
        elif tag == b"IEND":
            break
    if ihdr is None or len(ihdr) < 13 or not idat:
        raise ValueError("PNG: missing IHDR/IDAT")
    w, h = struct.unpack(">II", ihdr[:8])
    depth, ctype, comp, filt, interlace = ihdr[8:13]
    if depth != 8 or ctype not in _PNG_CHANNELS:
        raise NotImplementedError(
            f"PNG: unsupported depth/color (depth={depth}, type={ctype})"
        )
    if comp or filt or interlace:
        raise NotImplementedError("PNG: interlace/non-zero methods")
    try:
        raw = zlib.decompress(b"".join(idat))
    except zlib.error as e:
        raise ValueError(f"PNG: bad IDAT stream ({e})") from None
    return _png_unfilter(raw, h, w, _PNG_CHANNELS[ctype])


def encode_png(img: np.ndarray, filter_type: int = 0) -> bytes:
    """Pure-stdlib PNG encode of an (h, w, c) uint8 array (c in 1/3/4),
    one filter type for all scanlines (encoding filters have no
    sequential dependency, so all five are vectorized per line)."""
    import zlib

    img = np.ascontiguousarray(img, dtype=np.uint8)
    h, w, c = img.shape
    ctype = {1: 0, 3: 2, 4: 6}[c]
    flat = img.reshape(h, w * c).astype(np.int32)
    lines = []
    for y in range(h):
        cur = flat[y]
        prev = flat[y - 1] if y else np.zeros(w * c, np.int32)
        left = np.concatenate([np.zeros(c, np.int32), cur[:-c]])
        ul = np.concatenate([np.zeros(c, np.int32), prev[:-c]])
        if filter_type == 0:
            enc = cur
        elif filter_type == 1:
            enc = cur - left
        elif filter_type == 2:
            enc = cur - prev
        elif filter_type == 3:
            enc = cur - ((left + prev) >> 1)
        elif filter_type == 4:
            p = left + prev - ul
            pa_, pb, pc_ = np.abs(p - left), np.abs(p - prev), np.abs(p - ul)
            pred = np.where(
                (pa_ <= pb) & (pa_ <= pc_), left, np.where(pb <= pc_, prev, ul)
            )
            enc = cur - pred
        else:
            raise ValueError(f"PNG filter {filter_type}")
        lines.append(bytes([filter_type]) + (enc & 0xFF).astype(np.uint8).tobytes())
    comp = zlib.compress(b"".join(lines), 9)

    def chunk(tag: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + tag
            + data
            + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, ctype, 0, 0, 0)
    return (
        PNG_SIG + chunk(b"IHDR", ihdr) + chunk(b"IDAT", comp) + chunk(b"IEND", b"")
    )


def decode_image(blob: bytes, fmt: str) -> np.ndarray:
    """Decode a binary image payload to an (h, w, c) uint8 array.

    Implemented: the deterministic fixture format (kgim) and baseline
    PNG (pure stdlib, `decode_png`). Other real codecs (jpeg/webp/...)
    need libraries absent from this container."""
    if fmt == "kgim" and blob[:4] == MAGIC:
        w, h, c = struct.unpack(">III", blob[4:16])
        return np.frombuffer(blob[16 : 16 + w * h * c], dtype=np.uint8).reshape(h, w, c)
    if fmt == "png" or blob[:8] == PNG_SIG:
        return decode_png(blob)
    if fmt == "jpeg" or blob[:2] == b"\xff\xd8":
        # baseline JFIF, from scratch (extras/jpeg.py); NOTE: grayscale
        # JPEGs decode to (h, w, 1) — the 3-channel featurizer path
        # only ever receives color streams (the gray path is
        # codec-level, unit-tested directly)
        from .jpeg import decode_jpeg

        return decode_jpeg(blob)
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
            except (NotImplementedError, ValueError):
                # unknown format OR truncated blob (short payload
                # raises ValueError in the reshape)
                feats.append([0.0] * self.proj.shape[1])
                ok.append(False)
                continue
            hist = np.stack(
                [np.histogram(img[..., ch], bins=8, range=(0, 256))[0] for ch in range(img.shape[2])]
            ).astype(np.float64)
            hist /= max(1.0, hist.sum())
            feats.append((hist.reshape(-1) @ self.proj).round(6).tolist())
            ok.append(True)
        out = {
            "img_id": ids,
            "feature": pa.array(feats, type=pa.list_(pa.float64())),
            "decode_ok": pa.array(ok, type=pa.bool_()),
        }
        # pass through any extra side columns (e.g. the JPEG query's
        # encoder byte counts) — saves the fixed-cost hash join that
        # re-attaching them downstream would need. Never overwrite a
        # column this stage just computed: a stale upstream `feature`
        # or `decode_ok` would silently clobber the fresh values.
        for name in batch.column_names:
            if (
                name not in ("img_id", "image", "format", "width", "height")
                and name not in out
            ):
                out[name] = batch[name]
        return pa.table(out)


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


# ---------------------------------------------------------------------------
# Video plumbing (round 3): frame-sample + resize, the remaining two
# stages the brief names. Fixture format ("KGVD", deterministic fake
# video): 20-byte header magic(4) | nframes(4, BE) | width(4, BE) |
# height(4, BE) | channels(4, BE), then nframes contiguous
# w*h*c-byte frames.

VMAGIC = b"KGVD"


def make_video_table(n: int, seed: int = 43) -> pa.Table:
    """Deterministic fake-video fixture (vid_id, video: binary,
    nframes, width, height)."""
    rng = np.random.default_rng(seed)
    ids, blobs, nfs, ws, hs = [], [], [], [], []
    for i in range(n):
        nf = int(rng.integers(4, 17))
        w = int(rng.integers(8, 17))
        h = int(rng.integers(8, 17))
        c = 3
        payload = rng.integers(0, 256, size=nf * w * h * c, dtype=np.uint8).tobytes()
        blobs.append(VMAGIC + struct.pack(">IIII", nf, w, h, c) + payload)
        ids.append(i)
        nfs.append(nf)
        ws.append(w)
        hs.append(h)
    return pa.table(
        {
            "vid_id": pa.array(ids, type=pa.int64()),
            "video": pa.array(blobs, type=pa.binary()),
            "nframes": pa.array(nfs, type=pa.int32()),
            "width": pa.array(ws, type=pa.int32()),
            "height": pa.array(hs, type=pa.int32()),
        }
    )


def sample_frames(ds: Dataset, stride: int = 4) -> Dataset:
    """Frame sampling as a flat-map-shaped map_batches: one output row
    per kept frame (frame_idx = 0, stride, 2*stride, ...), each frame
    re-wrapped as a KGIM image blob so the stage COMPOSES with
    `image_metadata` / `ImageFeaturizer` / `resize_images`. The
    per-video loop is inherent (variable-size binary rows slice one at
    a time — the same regime as decode); batches stay small because
    rows are wide."""

    def f(batch: pa.Table) -> pa.Table:
        out_v, out_f, out_img = [], [], []
        for vid, blob in zip(
            batch["vid_id"].to_pylist(), batch["video"].to_pylist()
        ):
            if not blob or len(blob) < 20 or blob[:4] != VMAGIC:
                continue
            nf, w, h, c = struct.unpack(">IIII", blob[4:20])
            fb = w * h * c
            if len(blob) < 20 + nf * fb:
                continue  # truncated payload: skip, never slice short
            for j in range(0, nf, stride):
                frame = blob[20 + j * fb : 20 + (j + 1) * fb]
                out_v.append(vid)
                out_f.append(j)
                out_img.append(MAGIC + struct.pack(">III", w, h, c) + frame)
        return pa.table(
            {
                "vid_id": pa.array(out_v, type=pa.int64()),
                "frame_idx": pa.array(out_f, type=pa.int64()),
                "image": pa.array(out_img, type=pa.binary()),
            }
        )

    return ds.map_batches(f, batch_size=32, batch_format="pyarrow")


def resize_nearest(img: np.ndarray, out_w: int, out_h: int) -> np.ndarray:
    """Deterministic nearest-neighbor resize, PURE INTEGER index
    arithmetic (row i maps to floor(i*h/out_h)) — no float rounding to
    drift between implementations."""
    h, w, _ = img.shape
    ri = (np.arange(out_h, dtype=np.int64) * h) // out_h
    ci = (np.arange(out_w, dtype=np.int64) * w) // out_w
    return img[ri][:, ci]


def resize_images(ds: Dataset, out_w: int, out_h: int) -> Dataset:
    """Resize stage over KGIM blobs: decode (fixture codec) → nearest
    resize → re-encode. Unknown formats pass through with
    resize_ok=false (never raise — the M2 error-column convention)."""

    def f(batch: pa.Table) -> pa.Table:
        out, ok = [], []
        for blob in batch["image"].to_pylist():
            try:
                img = decode_image(blob, "kgim")
            except (NotImplementedError, ValueError):
                # unknown format OR truncated/corrupt blob (short
                # payload makes the reshape raise ValueError): pass
                # through with ok=false, never crash the task
                out.append(blob)
                ok.append(False)
                continue
            r = resize_nearest(img, out_w, out_h)
            out.append(
                MAGIC
                + struct.pack(">III", out_w, out_h, img.shape[2])
                + np.ascontiguousarray(r).tobytes()
            )
            ok.append(True)
        t = batch.drop_columns(["image"])
        return t.append_column("image", pa.array(out, type=pa.binary())).append_column(
            "resize_ok", pa.array(ok, type=pa.bool_())
        )

    return ds.map_batches(f, batch_size=32, batch_format="pyarrow")


def expected_video_table(n: int, stride: int = 4, out_wh: int = 8) -> pa.Table:
    """Independent sequential oracle for the frame-sample → resize →
    aggregate chain: per sampled frame, the int64 sum of the resized
    pixels. Different code shape from the engine stages (pure-python
    header parse, list-comprehension index gather, python-int sum)."""
    src = make_video_table(n)
    out_v, out_f, out_s = [], [], []
    for i in range(n):
        blob = src["video"][i].as_py()
        nf = int.from_bytes(blob[4:8], "big")
        w = int.from_bytes(blob[8:12], "big")
        h = int.from_bytes(blob[12:16], "big")
        c = int.from_bytes(blob[16:20], "big")
        fb = w * h * c
        ri = [(y * h) // out_wh for y in range(out_wh)]
        ci = [(x * w) // out_wh for x in range(out_wh)]
        for j in range(0, nf, stride):
            frame = blob[20 + j * fb : 20 + (j + 1) * fb]
            s = 0
            for y in ri:
                row = frame[y * w * c : (y + 1) * w * c]
                for x in ci:
                    px = row[x * c : (x + 1) * c]
                    s += px[0] + px[1] + px[2]
            out_v.append(i)
            out_f.append(j)
            out_s.append(s)
    return pa.table(
        {
            "vid_id": pa.array(out_v, type=pa.int64()),
            "frame_idx": pa.array(out_f, type=pa.int64()),
            "px_sum": pa.array(out_s, type=pa.int64()),
        }
    )


# ---------------------------------------------------------------------------
# WAV/PCM audio (round 5, VERDICT r4 #6): a REAL pure-stdlib codec for
# the audio modality, same shape as the PNG path — RIFF/WAVE container
# with 16-bit integer PCM (the uncompressed baseline every recorder
# can emit; format spec is public: RIFF chunks + fmt/data). Anything
# fancier (float PCM, 8/24-bit, ADPCM, extensible) raises
# NotImplementedError = decode_ok False, per the repo's honest-stub
# convention. Truncated data chunks raise ValueError.


def encode_wav(samples: np.ndarray, sample_rate: int) -> bytes:
    """int16 (frames, channels) -> canonical RIFF/WAVE PCM bytes."""
    if samples.dtype != np.int16 or samples.ndim != 2:
        raise ValueError("encode_wav wants int16 (frames, channels)")
    ch = samples.shape[1]
    data = samples.tobytes()  # interleaved little-endian int16
    fmt = struct.pack("<HHIIHH", 1, ch, sample_rate, sample_rate * ch * 2, ch * 2, 16)
    return (
        b"RIFF"
        + struct.pack("<I", 4 + 8 + len(fmt) + 8 + len(data))
        + b"WAVE"
        + b"fmt "
        + struct.pack("<I", len(fmt))
        + fmt
        + b"data"
        + struct.pack("<I", len(data))
        + data
    )


def decode_wav(blob: bytes) -> tuple[np.ndarray, int]:
    """RIFF/WAVE chunk walk -> (int16 (frames, channels), sample_rate).

    Handles chunk ordering and odd-size pad bytes per the RIFF spec;
    requires format tag 1 (integer PCM) at 16 bits — others raise
    NotImplementedError; short/missing fmt or data raises ValueError."""
    if len(blob) < 12 or blob[:4] != b"RIFF" or blob[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE blob")
    pos, n = 12, len(blob)
    fmt_info = None
    data = None
    while pos + 8 <= n:
        cid = blob[pos : pos + 4]
        (size,) = struct.unpack("<I", blob[pos + 4 : pos + 8])
        body = blob[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            if size < 16:
                raise ValueError("fmt chunk too short")
            fmt_info = struct.unpack("<HHIIHH", body[:16])
        elif cid == b"data":
            if len(body) < size:
                raise ValueError("truncated data chunk")
            data = body
        pos += 8 + size + (size & 1)  # RIFF pads odd chunks
    if fmt_info is None or data is None:
        raise ValueError("missing fmt or data chunk")
    audio_format, channels, sample_rate, _, _, bits = fmt_info
    if audio_format != 1 or bits != 16:
        raise NotImplementedError(
            f"WAV: only 16-bit integer PCM decoded from scratch "
            f"(format={audio_format}, bits={bits})"
        )
    x = np.frombuffer(data[: (len(data) // (2 * channels)) * 2 * channels], dtype="<i2")
    return x.reshape(-1, channels).astype(np.int16), sample_rate


def _audio_samples(i: int, rng) -> tuple[np.ndarray, int]:
    """Seeded per-row PCM: a sine at a row-dependent pitch plus uniform
    noise, mono or stereo, 8000 Hz — shared by fixture and oracle."""
    sr = 8000
    ch = 1 + (i % 3 == 0)  # every 3rd row stereo
    frames = int(rng.integers(400, 1600))
    t = np.arange(frames, dtype=np.float64)
    base = 6000.0 * np.sin(2 * np.pi * (100.0 + 7.0 * i) * t / sr)
    out = np.empty((frames, ch), dtype=np.int16)
    for c in range(ch):
        noise = rng.integers(-500, 500, frames)
        out[:, c] = np.clip(base * (1.0 - 0.25 * c) + noise, -32768, 32767).astype(
            np.int16
        )
    return out, sr


def make_audio_table(n: int, seed: int = 44) -> pa.Table:
    """Deterministic WAV fixture (audio_id, audio: binary, format).
    Every 23rd row (i % 23 == 5) is truncated mid-data to exercise the
    error path end to end."""
    rng = np.random.default_rng(seed)
    ids, blobs = [], []
    for i in range(n):
        samples, sr = _audio_samples(i, rng)
        blob = encode_wav(samples, sr)
        if i % 23 == 5:
            blob = blob[: len(blob) - len(blob) // 3]
        ids.append(i)
        blobs.append(blob)
    return pa.table(
        {
            "audio_id": pa.array(ids, type=pa.int64()),
            "audio": pa.array(blobs, type=pa.binary()),
            "format": pa.array(["wav"] * n, type=pa.string()),
        }
    )


class AudioFeaturizer:
    """Actor-pool stage: binary WAV batch -> scalar audio features.
    Integer features (frames, peak, zero crossings) are exact; rms is
    the one float, rounded to 4 decimals for the string-compare
    oracle. Failed decodes -> decode_ok False + NULL features."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch["audio_id"]
        srs, fr, pk, zc, rms, ok = [], [], [], [], [], []
        for blob in batch["audio"].to_pylist():
            try:
                x, sr = decode_wav(blob)
            except (NotImplementedError, ValueError):
                srs.append(None)
                fr.append(None)
                pk.append(None)
                zc.append(None)
                rms.append(0.0)
                ok.append(False)
                continue
            mono = x[:, 0].astype(np.float64)
            srs.append(sr)
            fr.append(x.shape[0])
            # int64 abs: np.abs(int16 -32768) would overflow back to -32768
            pk.append(int(np.abs(x.astype(np.int64)).max()) if x.size else 0)
            zc.append(int(((mono[:-1] < 0) != (mono[1:] < 0)).sum()))
            rms.append(round(float(np.sqrt(np.mean(mono**2))), 4) if x.size else 0.0)
            ok.append(True)
        return pa.table(
            {
                "audio_id": ids,
                "sample_rate": pa.array(srs, type=pa.int32()),
                "n_frames": pa.array(fr, type=pa.int64()),
                "peak": pa.array(pk, type=pa.int32()),
                "zero_crossings": pa.array(zc, type=pa.int64()),
                "rms": pa.array(rms, type=pa.float64()),
                "decode_ok": pa.array(ok, type=pa.bool_()),
            }
        )


def featurize_audio(ds: Dataset, *, batch_size: int = 64, concurrency=(1, 4)) -> Dataset:
    return ds.map_batches(
        AudioFeaturizer,
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
        num_cpus=1,
    )


def expected_audio_table(n: int, seed: int = 44) -> pa.Table:
    """Independent sequential oracle for `queries.q_multimodal_wav_features`:
    shares only the sample generator with the fixture; features are
    computed from the RAW samples (no encode/decode round trip), with
    different code shape (dot product for rms, signbit diff for
    crossings), so a codec bug can't cancel out."""
    rng = np.random.default_rng(seed)
    srs, fr, pk, zc, rms, ok = [], [], [], [], [], []
    for i in range(n):
        x, sr = _audio_samples(i, rng)
        if i % 23 == 5:  # fixture truncates these: decode must fail
            srs.append(None)
            fr.append(None)
            pk.append(None)
            zc.append(None)
            rms.append(0.0)
            ok.append(False)
            continue
        mono = x[:, 0].astype(np.float64)
        srs.append(sr)
        fr.append(x.shape[0])
        pk.append(int(max(abs(int(x.min())), int(x.max()))))
        zc.append(int(np.count_nonzero(np.diff(np.signbit(mono)))))
        rms.append(round(float(np.sqrt(np.dot(mono, mono) / len(mono))), 4))
        ok.append(True)
    return pa.table(
        {
            "audio_id": pa.array(list(range(n)), type=pa.int64()),
            "sample_rate": pa.array(srs, type=pa.int32()),
            "n_frames": pa.array(fr, type=pa.int64()),
            "peak": pa.array(pk, type=pa.int32()),
            "zero_crossings": pa.array(zc, type=pa.int64()),
            "rms": pa.array(rms, type=pa.float64()),
            "decode_ok": pa.array(ok, type=pa.bool_()),
        }
    )
