"""Independent sequential JPEG (baseline) decoder — the parity twin
for kgray/extras/jpeg.py's `decode_jpeg`.

Same public integer spec (ITU-T T.81 baseline + the repo's fixed-point
IDCT/color contract documented in extras/jpeg.py), deliberately
DIFFERENT code shape so a shared bug cannot cancel out:

  * bit reading: a generator yielding single bits from an unstuffed
    byte list (the engine uses an accumulator-window reader);
  * Huffman: canonical codes materialized as a string-keyed prefix
    dict walked bit by bit (engine: (length, int-code) lookup);
  * IDCT: four explicit Python loops over the shared integer basis
    table (engine: two numpy int64 matmuls) — integer sums are
    order-independent, so the two must agree bit for bit;
  * color conversion: per-pixel Python ints (engine: vectorized).

Only `idct_basis_int` is imported from the engine module: it IS the
published contract (64 integers both sides must use verbatim).
"""

from __future__ import annotations

import numpy as np

from kgray.extras.jpeg import idct_basis_int

_ZZ = [
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
]


def _prefix_dict(bits: list, vals: list) -> dict:
    """Canonical Huffman as {'0101...': symbol} (T.81 Annex C)."""
    table, code, k = {}, 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            table[format(code, f"0{length}b")] = vals[k]
            code += 1
            k += 1
        code = code << 1
    return table


class _TwinBits:
    """MSB-first bit source over entropy-coded data: one byte at a
    time exploded into a pending-bit list (vs the engine's integer
    accumulator window), FF00 unstuffed, RSTn consumed on request."""

    def __init__(self, data: bytes, start: int):
        self.data = data
        self.i = start
        self.pending: list = []

    def next_bit(self) -> int:
        if not self.pending:
            if self.i >= len(self.data):
                raise ValueError("twin: scan exhausted")
            byte = self.data[self.i]
            self.i += 1
            if byte == 0xFF:
                if self.i < len(self.data) and self.data[self.i] == 0x00:
                    self.i += 1
                else:
                    raise ValueError("twin: marker in scan")
            self.pending = [(byte >> s) & 1 for s in (7, 6, 5, 4, 3, 2, 1, 0)]
        return self.pending.pop(0)

    def restart(self):
        self.pending = []  # drop the 1-padding before the marker
        if (
            self.i + 2 > len(self.data)
            or self.data[self.i] != 0xFF
            or not (0xD0 <= self.data[self.i + 1] <= 0xD7)
        ):
            raise ValueError("twin: expected RST marker")
        self.i += 2


def _read_sym(bits: _TwinBits, table: dict) -> int:
    key = ""
    for _ in range(16):
        key += "1" if bits.next_bit() else "0"
        if key in table:
            return table[key]
    raise ValueError("twin: bad Huffman code")


def _read_amp(bits: _TwinBits, cat: int) -> int:
    if cat == 0:
        return 0
    v = 0
    for _ in range(cat):
        v = (v << 1) | bits.next_bit()
    return v if v >= (1 << (cat - 1)) else v - (1 << cat) + 1


def decode_jpeg_twin(blob: bytes) -> np.ndarray:
    if blob[0] != 0xFF or blob[1] != 0xD8:
        raise ValueError("twin: bad SOI")
    T = idct_basis_int().tolist()
    qt: dict[int, list] = {}
    huff: dict[tuple, dict] = {}
    dims = None
    comp_q: list = []
    scan_tabs: list = []
    dri = 0
    i = 2
    while True:
        if i + 4 > len(blob) or blob[i] != 0xFF:
            raise ValueError("twin: marker desync")
        marker = blob[i + 1]
        seglen = (blob[i + 2] << 8) | blob[i + 3]
        body = blob[i + 4 : i + 2 + seglen]
        if len(body) != seglen - 2:
            raise ValueError("twin: truncated segment")
        if marker == 0xDB:
            j = 0
            while j < len(body):
                if body[j] >> 4:
                    raise NotImplementedError("twin: 16-bit quant")
                qt[body[j] & 15] = list(body[j + 1 : j + 65])
                j += 65
        elif marker == 0xC4:
            j = 0
            while j < len(body):
                tc_th = body[j]
                counts = list(body[j + 1 : j + 17])
                nv = sum(counts)
                huff[(tc_th >> 4, tc_th & 15)] = _prefix_dict(
                    counts, list(body[j + 17 : j + 17 + nv])
                )
                j += 17 + nv
        elif marker == 0xC0:
            if body[0] != 8:
                raise NotImplementedError("twin: 8-bit only")
            h = (body[1] << 8) | body[2]
            w = (body[3] << 8) | body[4]
            nc = body[5]
            samps = []
            for c in range(nc):
                s = body[7 + 3 * c]
                samps.append((s >> 4, s & 15))
                comp_q.append(body[8 + 3 * c])
            if samps != [(1, 1)] * nc and samps != [(2, 2), (1, 1), (1, 1)]:
                raise NotImplementedError("twin: 4:4:4 or 4:2:0 only")
            dims = (h, w, nc)
        elif marker == 0xDD:
            dri = (body[0] << 8) | body[1]
        elif marker in (0xC1, 0xC2, 0xC3):
            raise NotImplementedError("twin: baseline only")
        elif marker == 0xDA:
            ns = body[0]
            for c in range(ns):
                scan_tabs.append(body[2 + 2 * c])
            i += 2 + seglen
            break
        i += 2 + seglen
    if dims is None:
        raise ValueError("twin: missing SOF")
    h, w, nc = dims
    max_h = max(s[0] for s in samps)
    max_v = max(s[1] for s in samps)
    bitgen = _TwinBits(blob, i)
    mcu_rows = (h + 8 * max_v - 1) // (8 * max_v)
    mcu_cols = (w + 8 * max_h - 1) // (8 * max_h)
    planes = [
        [[0] * (mcu_cols * hi * 8) for _ in range(mcu_rows * vi * 8)]
        for hi, vi in samps
    ]
    pred = [0] * nc
    n_mcu = 0
    for mby in range(mcu_rows):
        for mbx in range(mcu_cols):
            if dri and n_mcu and n_mcu % dri == 0:
                bitgen.restart()
                pred = [0] * nc
            n_mcu += 1
            for c in range(nc):
                hi, vi = samps[c]
                dc_t = huff[(0, scan_tabs[c] >> 4)]
                ac_t = huff[(1, scan_tabs[c] & 15)]
                q = qt[comp_q[c]]
                for sub_y in range(vi):
                    for sub_x in range(hi):
                        zz = [0] * 64
                        cat = _read_sym(bitgen, dc_t)
                        pred[c] += _read_amp(bitgen, cat)
                        zz[0] = pred[c]
                        k = 1
                        while k < 64:
                            sym = _read_sym(bitgen, ac_t)
                            if sym == 0:
                                break
                            run, cat = sym >> 4, sym & 15
                            if cat == 0:
                                k += 16
                                continue
                            k += run
                            zz[k] = _read_amp(bitgen, cat)
                            k += 1
                        # dequant + unzigzag into a natural-order 8x8
                        F = [[0] * 8 for _ in range(8)]
                        for k in range(64):
                            nat = _ZZ[k]
                            F[nat // 8][nat % 8] = zz[k] * q[k]
                        # fixed-point IDCT, four explicit loops
                        for x in range(8):
                            for y in range(8):
                                acc = 0
                                for u in range(8):
                                    tux = T[u][x]
                                    for v in range(8):
                                        acc += tux * T[v][y] * F[u][v]
                                px = ((acc + (1 << 23)) >> 24) + 128
                                planes[c][(mby * vi + sub_y) * 8 + x][
                                    (mbx * hi + sub_x) * 8 + y
                                ] = 0 if px < 0 else (255 if px > 255 else px)
    if nc == 1:
        arr = np.array(planes[0], dtype=np.uint8)[:h, :w]
        return arr[..., None]
    out = np.zeros((h, w, 3), dtype=np.uint8)
    hy, vy = samps[0]
    hc, vc = samps[1]
    for r in range(h):
        for cc in range(w):
            # subsampled components read their floor-scaled sample —
            # the same replication rule as the engine's np.repeat
            y_ = planes[0][r * vy // max_v][cc * hy // max_h]
            cb = planes[1][r * vc // max_v][cc * hc // max_h] - 128
            cr = planes[2][r * vc // max_v][cc * hc // max_h] - 128
            rr = y_ + ((91881 * cr + 32768) >> 16)
            gg = y_ - ((22554 * cb + 46802 * cr + 32768) >> 16)
            bb = y_ + ((116130 * cb + 32768) >> 16)
            out[r, cc, 0] = 0 if rr < 0 else (255 if rr > 255 else rr)
            out[r, cc, 1] = 0 if gg < 0 else (255 if gg > 255 else gg)
            out[r, cc, 2] = 0 if bb < 0 else (255 if bb > 255 else bb)
    return out


def expected_jpeg_table(n: int):
    """Expected table for queries.q_multimodal_jpeg_features: the same
    deterministic fixture images, encoded by the engine encoder (the
    encoder DEFINES the byte stream; both sides must consume identical
    blobs), decoded by THIS twin, features re-derived with different
    code shape (bincount over channel slices + einsum, vs the engine's
    np.histogram + matmul)."""
    import pyarrow as pa

    from kgray.extras.jpeg import encode_jpeg
    from kgray.extras.multimodal import FEAT_DIM, make_image_table

    src = make_image_table(n)
    rng = np.random.default_rng(0)  # ImageFeaturizer's seeded "model"
    proj = rng.standard_normal((3 * 8, FEAT_DIM))
    ids, nbytes, dok, fn = [], [], [], []
    for i in range(n):
        blob = src["image"][i].as_py()
        w = int.from_bytes(blob[4:8], "big")
        h = int.from_bytes(blob[8:12], "big")
        raw = np.frombuffer(blob[16:], dtype=np.uint8).reshape(h, w, 3)
        jblob = encode_jpeg(
            raw,
            quality=(95, 85, 75)[i % 3],
            subsample=(i % 2 == 1),
            restart_interval=(0, 2, 5)[i % 3],
        )
        img = decode_jpeg_twin(jblob)
        hist = np.zeros((3, 8), dtype=np.float64)
        flat = img.reshape(-1, 3)
        for ch in range(3):
            hist[ch] = np.bincount(flat[:, ch] >> 5, minlength=8)
        hist /= max(1.0, hist.sum())
        feat = np.round(np.einsum("i,ij->j", hist.reshape(-1), proj), 6)
        ids.append(i)
        nbytes.append(len(jblob))
        dok.append(True)
        fn.append(round(float(np.linalg.norm(feat)), 4))
    return pa.table(
        {
            "img_id": pa.array(ids, type=pa.int64()),
            "jpeg_bytes": pa.array(nbytes, type=pa.int64()),
            "decode_ok": pa.array(dok, type=pa.bool_()),
            "feat_norm": pa.array(fn, type=pa.float64()),
        }
    )
