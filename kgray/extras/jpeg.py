"""Pure-stdlib baseline JPEG codec (X12d) — the third real codec
behind the multimodal featurizer, after PNG (X12b) and WAV (X12c).

No image library exists in this container, so both directions are
implemented from the public ITU-T T.81 spec: a baseline sequential
encoder (SOI/APP0/DQT/SOF0/DHT/SOS, Annex-K quantization + Huffman
tables, libjpeg-style quality scaling, 4:4:4 — no subsampling) and a
matching decoder.

Parity contract: JPEG is lossy, so the PNG trick (features of decoded
pixels == features of raw pixels) does not apply. Instead the DECODER
is written against an integer-exact spec that an independent
sequential twin (reference_impl/jpeg_twin.py) re-implements with
different code shape, and the oracle compares the two decoders
bit-for-bit on the same encoded blobs:

  * entropy decode + dequantize + un-zigzag: pure integer, exact;
  * IDCT: fixed-point int64 — basis T[u][x] = round(4096 * C(u)/2 *
    cos((2x+1) u pi / 16)), pixel = ((T' F T + 2^23) >> 24) + 128,
    clamped. Integer sums are order-independent, so numpy matmul here
    and nested loops in the twin CANNOT drift (a float IDCT could
    differ by one ulp and flip a rounded pixel);
  * YCbCr -> RGB: the integer BT.601 form (91881/22554/46802/116130
    over 2^16 with +32768 rounding), identical on both sides.

The ENCODER is the defining implementation (float64 fDCT is fine: the
decoders consume its bytes, they never re-derive them). Supported
stream shapes: 4:4:4 and 4:2:0 sampling, 1 or 3 components, restart
intervals (DRI/RSTn). Unsupported — progressive (SOF2), 12-bit,
4:2:2/other sampling, arithmetic coding — raise NotImplementedError
per the repo's honest-stub convention; malformed/truncated streams
raise ValueError.
"""

from __future__ import annotations

import math
import struct

import numpy as np

# --------------------------------------------------------------------------
# spec tables (ITU-T T.81 Annex K — public)

ZIGZAG = np.array(
    [
        0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
        12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
        35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
        58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
    ],
    dtype=np.int64,
)

QUANT_LUMA = np.array(
    [
        16, 11, 10, 16, 24, 40, 51, 61,
        12, 12, 14, 19, 26, 58, 60, 55,
        14, 13, 16, 24, 40, 57, 69, 56,
        14, 17, 22, 29, 51, 87, 80, 62,
        18, 22, 37, 56, 68, 109, 103, 77,
        24, 35, 55, 64, 81, 104, 113, 92,
        49, 64, 78, 87, 103, 121, 120, 101,
        72, 92, 95, 98, 112, 100, 103, 99,
    ],
    dtype=np.int64,
)

QUANT_CHROMA = np.array(
    [17, 18, 24, 47, 99, 99, 99, 99,
     18, 21, 26, 66, 99, 99, 99, 99,
     24, 26, 56, 99, 99, 99, 99, 99,
     47, 66, 99, 99, 99, 99, 99, 99]
    + [99] * 32,
    dtype=np.int64,
)

# (bits[1..16], symbol values) per Annex K
DC_LUMA = ([0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0], list(range(12)))
DC_CHROMA = ([0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0], list(range(12)))
AC_LUMA = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
    [
        0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41, 0x06,
        0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
        0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24, 0x33, 0x62, 0x72,
        0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
        0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44, 0x45,
        0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
        0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75,
        0x76, 0x77, 0x78, 0x79, 0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
        0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
        0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
        0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
        0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
        0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2, 0xF3, 0xF4,
        0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
    ],
)
AC_CHROMA = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77],
    [
        0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12, 0x41,
        0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
        0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15, 0x62, 0x72, 0xD1,
        0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
        0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44,
        0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
        0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74,
        0x75, 0x76, 0x77, 0x78, 0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
        0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A,
        0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
        0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
        0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
        0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2, 0xF3, 0xF4,
        0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
    ],
)


def quant_tables(quality: int) -> tuple[np.ndarray, np.ndarray]:
    """Annex-K tables scaled the libjpeg way (public formula):
    scale = 5000/q (q<50) else 200-2q; entry = clamp((base*scale+50)//100, 1..255)."""
    q = min(100, max(1, int(quality)))
    scale = 5000 // q if q < 50 else 200 - 2 * q
    out = []
    for base in (QUANT_LUMA, QUANT_CHROMA):
        t = (base * scale + 50) // 100
        out.append(np.clip(t, 1, 255).astype(np.int64))
    return out[0], out[1]


# fixed-point IDCT basis — the exact integers the twin must reproduce
def idct_basis_int() -> np.ndarray:
    t = np.zeros((8, 8), dtype=np.int64)
    for u in range(8):
        cu = math.sqrt(0.5) if u == 0 else 1.0
        for x in range(8):
            t[u, x] = round(4096 * (cu / 2.0) * math.cos((2 * x + 1) * u * math.pi / 16))
    return t


_T_INT = idct_basis_int()

# float basis for the forward DCT (encoder only; decoders never use it)
_B_FLOAT = np.zeros((8, 8))
for _u in range(8):
    _cu = math.sqrt(0.5) if _u == 0 else 1.0
    for _x in range(8):
        _B_FLOAT[_u, _x] = (_cu / 2.0) * math.cos((2 * _x + 1) * _u * math.pi / 16)


def idct_block_int(coeffs: np.ndarray) -> np.ndarray:
    """Fixed-point 2D IDCT of one dequantized 8x8 int block -> uint8.

    pixel(x,y) = clamp(((sum_uv T[u,x] T[v,y] F[u,v] + 2^23) >> 24) + 128).
    All-integer, so any evaluation order gives identical results."""
    s = _T_INT.T @ coeffs.astype(np.int64)  # s[x, v]
    p = s @ _T_INT  # p[x, y]
    return np.clip(((p + (1 << 23)) >> 24) + 128, 0, 255).astype(np.uint8)


def ycbcr_to_rgb_int(y: np.ndarray, cb: np.ndarray, cr: np.ndarray) -> np.ndarray:
    """Integer JFIF/BT.601 color conversion (both decoders, bit-exact)."""
    y_ = y.astype(np.int64)
    cb_ = cb.astype(np.int64) - 128
    cr_ = cr.astype(np.int64) - 128
    r = y_ + ((91881 * cr_ + 32768) >> 16)
    g = y_ - ((22554 * cb_ + 46802 * cr_ + 32768) >> 16)
    b = y_ + ((116130 * cb_ + 32768) >> 16)
    return np.clip(np.stack([r, g, b], axis=-1), 0, 255).astype(np.uint8)


# --------------------------------------------------------------------------
# Huffman helpers

def _huff_codes(bits: list, vals: list) -> dict:
    """symbol -> (code, length) per the canonical T.81 assignment."""
    out, code, k = {}, 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


def _huff_lookup(bits: list, vals: list) -> np.ndarray:
    """Decoder table compiled FLAT: a 2^16 array indexed by the next
    16 bits of the stream, entry = (symbol << 5) | code_length, 0 =
    invalid. One peek + one lookup per symbol instead of walking the
    code bit by bit — the entropy loop was the decoder's hot path
    (measured ~20 ms/image before, ~2 ms after; with the encoder's
    nonzero-only AC walk the oracle query's compute dropped from ~35 s
    sequential to ~2.2 s, leaving fixed actor-pool startup as the
    remaining wall). Every 16-bit value sharing a code's prefix maps
    to it, filled as one numpy slice per code."""
    tbl = np.zeros(1 << 16, dtype=np.int32)
    for sym, (code, ln) in _huff_codes(bits, vals).items():
        start = code << (16 - ln)
        tbl[start : start + (1 << (16 - ln))] = (sym << 5) | ln
    return tbl


def _category(v: int) -> int:
    return int(v).bit_length() if v > 0 else int(-v).bit_length()


class _BitWriter:
    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.nbits = 0

    def put(self, code: int, length: int):
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            byte = (self.acc >> (self.nbits - 8)) & 0xFF
            self.nbits -= 8
            self.buf.append(byte)
            if byte == 0xFF:  # byte stuffing
                self.buf.append(0x00)
        # keep only the live low bits: an unmasked Python-int
        # accumulator grows with every bit ever written, making the
        # entropy loop O(scan_bytes^2) on large images
        self.acc &= (1 << self.nbits) - 1

    def align(self):
        """Byte-align with 1-padding (before a restart marker)."""
        if self.nbits:
            pad = 8 - self.nbits
            self.put((1 << pad) - 1, pad)

    def raw_marker(self, byte2: int):
        """Emit FF xx OUTSIDE entropy coding (no stuffing)."""
        self.align()
        self.buf += bytes([0xFF, byte2])

    def done(self) -> bytes:
        self.align()  # pad with 1s per spec
        return bytes(self.buf)


# --------------------------------------------------------------------------
# encoder

def _rgb_to_ycbcr(img: np.ndarray) -> np.ndarray:
    f = img.astype(np.float64)
    r, g, b = f[..., 0], f[..., 1], f[..., 2]
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
    cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
    return np.clip(np.rint(np.stack([y, cb, cr], axis=-1)), 0, 255).astype(np.uint8)


def _box_subsample(p: np.ndarray) -> np.ndarray:
    """2x2 integer box mean with +2 rounding (the 4:2:0 chroma spec
    the decoders never see — encoder-only, but pinned for stability)."""
    h, w = p.shape
    e = np.pad(p, ((0, h % 2), (0, w % 2)), mode="edge").astype(np.int64)
    return (
        (e[0::2, 0::2] + e[0::2, 1::2] + e[1::2, 0::2] + e[1::2, 1::2] + 2) >> 2
    ).astype(np.uint8)


def encode_jpeg(
    img: np.ndarray,
    quality: int = 85,
    subsample: bool = False,
    restart_interval: int = 0,
) -> bytes:
    """Baseline sequential JFIF encode of an (h, w, 3) RGB or (h, w, 1)
    grayscale uint8 array, Annex-K Huffman tables. `subsample=True`
    emits 4:2:0 (Y at 2x2, box-mean chroma — the profile nearly all
    real-world JPEGs use); default is 4:4:4. `restart_interval=N`
    emits a DRI segment and an RSTn marker every N MCUs (cameras do
    this for error resilience; DC predictors reset at each marker)."""
    img = np.ascontiguousarray(img, dtype=np.uint8)
    if img.ndim != 3 or img.shape[2] not in (1, 3):
        raise ValueError("encode_jpeg: need (h, w, 1|3) uint8")
    h, w, ncomp = img.shape
    if not h or not w:
        raise ValueError("encode_jpeg: empty image")
    qy, qc = quant_tables(quality)
    planes = (
        [img[..., 0]]
        if ncomp == 1
        else [(_ycc := _rgb_to_ycbcr(img))[..., 0], _ycc[..., 1], _ycc[..., 2]]
    )
    qtabs = [qy] + ([qc, qc] if ncomp == 3 else [])
    if subsample and ncomp == 3:
        sf = [(2, 2), (1, 1), (1, 1)]
        planes = [planes[0], _box_subsample(planes[1]), _box_subsample(planes[2])]
    else:
        sf = [(1, 1)] * ncomp
    max_h = max(s[0] for s in sf)
    max_v = max(s[1] for s in sf)
    mcu_rows = (h + 8 * max_v - 1) // (8 * max_v)
    mcu_cols = (w + 8 * max_h - 1) // (8 * max_h)
    padded = []
    for ci, p in enumerate(planes):
        hi, vi = sf[ci]
        th, tw = mcu_rows * vi * 8, mcu_cols * hi * 8
        padded.append(
            np.pad(
                p, ((0, th - p.shape[0]), (0, tw - p.shape[1])), mode="edge"
            ).astype(np.float64)
            - 128.0
        )

    dc_tabs = [_huff_codes(*DC_LUMA)] + ([_huff_codes(*DC_CHROMA)] * 2 if ncomp == 3 else [])
    ac_tabs = [_huff_codes(*AC_LUMA)] + ([_huff_codes(*AC_CHROMA)] * 2 if ncomp == 3 else [])

    bw = _BitWriter()
    pred = [0] * ncomp

    def put_block(block: np.ndarray, ci: int):
        f = _B_FLOAT @ block @ _B_FLOAT.T  # orthonormal fDCT
        zz = np.rint(f.reshape(-1)[ZIGZAG] / qtabs[ci].astype(np.float64)).astype(
            np.int64
        )
        # DC
        diff = int(zz[0]) - pred[ci]
        pred[ci] = int(zz[0])
        cat = _category(diff)
        code, ln = dc_tabs[ci][cat]
        bw.put(code, ln)
        if cat:
            bw.put(diff if diff > 0 else diff + (1 << cat) - 1, cat)
        # AC: run-length of zeros + category — visit only the nonzero
        # coefficients (most of a quantized block is zeros; iterating
        # all 64 in Python made the ENCODER the query's hot stage)
        last = 0
        for k in np.flatnonzero(zz[1:]) + 1:
            run = k - last - 1
            while run > 15:
                code, ln = ac_tabs[ci][0xF0]  # ZRL
                bw.put(code, ln)
                run -= 16
            v = int(zz[k])
            cat = _category(v)
            code, ln = ac_tabs[ci][(run << 4) | cat]
            bw.put(code, ln)
            bw.put(v if v > 0 else v + (1 << cat) - 1, cat)
            last = k
        if last != 63:
            code, ln = ac_tabs[ci][0x00]  # EOB
            bw.put(code, ln)

    # T.81 MCU interleave: per component, blocks left-to-right then
    # top-to-bottom within the MCU
    mcu_i = 0
    rst = 0
    for mr in range(mcu_rows):
        for mc in range(mcu_cols):
            if restart_interval and mcu_i and mcu_i % restart_interval == 0:
                bw.raw_marker(0xD0 + rst)  # RSTn, cycling 0..7
                rst = (rst + 1) & 7
                for ci in range(ncomp):
                    pred[ci] = 0
            mcu_i += 1
            for ci in range(ncomp):
                hi, vi = sf[ci]
                for by in range(vi):
                    for bx in range(hi):
                        r0 = (mr * vi + by) * 8
                        c0 = (mc * hi + bx) * 8
                        put_block(padded[ci][r0 : r0 + 8, c0 : c0 + 8], ci)
    scan = bw.done()

    def seg(marker: int, payload: bytes) -> bytes:
        return struct.pack(">HH", marker, len(payload) + 2) + payload

    out = [b"\xff\xd8"]  # SOI
    out.append(seg(0xFFE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"))
    out.append(seg(0xFFDB, b"\x00" + bytes(int(x) for x in qy)))
    if ncomp == 3:
        out.append(seg(0xFFDB, b"\x01" + bytes(int(x) for x in qc)))
    comp_spec = b"".join(
        struct.pack(
            "BBB", ci + 1, (sf[ci][0] << 4) | sf[ci][1], 0 if ci == 0 else 1
        )
        for ci in range(ncomp)
    )
    out.append(seg(0xFFC0, struct.pack(">BHHB", 8, h, w, ncomp) + comp_spec))
    dht = [(0x00, DC_LUMA), (0x10, AC_LUMA)]
    if ncomp == 3:
        dht += [(0x01, DC_CHROMA), (0x11, AC_CHROMA)]
    for tc_th, (bits, vals) in dht:
        out.append(seg(0xFFC4, bytes([tc_th]) + bytes(bits) + bytes(vals)))
    if restart_interval:
        out.append(seg(0xFFDD, struct.pack(">H", restart_interval)))
    sos_comp = b"".join(
        struct.pack("BB", ci + 1, 0x00 if ci == 0 else 0x11) for ci in range(ncomp)
    )
    out.append(seg(0xFFDA, bytes([ncomp]) + sos_comp + b"\x00\x3f\x00"))
    out.append(scan)
    out.append(b"\xff\xd9")  # EOI
    return b"".join(out)


# --------------------------------------------------------------------------
# decoder

class _BitReader:
    """MSB-first reader over entropy-coded data with 0xFF00 unstuffing."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.acc = 0
        self.nbits = 0

    def read(self, n: int) -> int:
        while self.nbits < n:
            if self.pos >= len(self.data):
                raise ValueError("JPEG: scan data exhausted")
            byte = self.data[self.pos]
            self.pos += 1
            if byte == 0xFF:
                nxt = self.data[self.pos] if self.pos < len(self.data) else None
                if nxt == 0x00:
                    self.pos += 1  # stuffed
                else:
                    raise ValueError("JPEG: unexpected marker in scan")
            self.acc = (self.acc << 8) | byte
            self.nbits += 8
        out = (self.acc >> (self.nbits - n)) & ((1 << n) - 1)
        self.nbits -= n
        self.acc &= (1 << self.nbits) - 1  # same O(n^2) guard as _BitWriter.put
        return out

    def peek16(self) -> int:
        """Next 16 bits WITHOUT consuming, 1-padded past the end of
        the entropy data (a marker or EOF stops the byte loads — the
        padding can never be consumed past the real bits because
        `skip` refuses to)."""
        while self.nbits < 16 and self.pos < len(self.data):
            byte = self.data[self.pos]
            if byte == 0xFF:
                if self.pos + 1 < len(self.data) and self.data[self.pos + 1] == 0x00:
                    self.pos += 2  # stuffed data byte
                else:
                    break  # real marker ends the entropy segment
            else:
                self.pos += 1
            self.acc = (self.acc << 8) | byte
            self.nbits += 8
        if self.nbits >= 16:
            return (self.acc >> (self.nbits - 16)) & 0xFFFF
        pad = 16 - self.nbits
        return ((self.acc << pad) | ((1 << pad) - 1)) & 0xFFFF

    def skip(self, n: int):
        if n > self.nbits:
            raise ValueError("JPEG: scan data exhausted")
        self.nbits -= n
        self.acc &= (1 << self.nbits) - 1

    def restart(self):
        """Consume an RSTn marker: drop the 1-padding bits left in the
        accumulator (always < 8 after a read), then the two marker
        bytes. The caller resets the DC predictors."""
        self.acc = 0
        self.nbits = 0
        if (
            self.pos + 2 > len(self.data)
            or self.data[self.pos] != 0xFF
            or not (0xD0 <= self.data[self.pos + 1] <= 0xD7)
        ):
            raise ValueError("JPEG: expected restart marker")
        self.pos += 2


def _extend(v: int, cat: int) -> int:
    """Sign-extend a category-coded amplitude (spec F.2.2.1 EXTEND)."""
    return v if v >= (1 << (cat - 1)) else v - (1 << cat) + 1


def _decode_sym(br: _BitReader, table: np.ndarray) -> int:
    e = int(table[br.peek16()])
    if e == 0:
        raise ValueError("JPEG: bad Huffman code")
    br.skip(e & 31)
    return e >> 5


def decode_jpeg(blob: bytes) -> np.ndarray:
    """Baseline sequential JFIF decode to an (h, w, 3|1) uint8 array,
    integer-exact per the module contract (see header). Supports
    SOF0, 8-bit, 1 or 3 components, 4:4:4 or 4:2:0 sampling
    (replication upsample), restart intervals; other profiles raise
    NotImplementedError. Malformed streams always surface as
    ValueError — length-consistent-but-short segment bodies would
    otherwise leak struct.error/IndexError past the featurizer's
    error-column convention and kill the whole Ray task."""
    try:
        return _decode_jpeg_impl(blob)
    except (struct.error, IndexError) as e:
        raise ValueError(f"JPEG: malformed stream ({e})") from None


def _decode_jpeg_impl(blob: bytes) -> np.ndarray:
    if blob[:2] != b"\xff\xd8":
        raise ValueError("JPEG: bad SOI")
    pos = 2
    qt: dict[int, np.ndarray] = {}
    huff: dict[tuple, np.ndarray] = {}
    sof = None
    scan_comp = None
    dri = 0
    while pos + 4 <= len(blob):
        if blob[pos] != 0xFF:
            raise ValueError("JPEG: marker desync")
        marker = blob[pos + 1]
        if marker in (0xC2, 0xC1, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError("JPEG: only baseline sequential (SOF0)")
        ln = struct.unpack(">H", blob[pos + 2 : pos + 4])[0]
        body = blob[pos + 4 : pos + 2 + ln]
        if len(body) != ln - 2:
            raise ValueError("JPEG: truncated segment")
        if marker == 0xDB:  # DQT (possibly several tables per segment)
            b = body
            while b:
                pq, tq = b[0] >> 4, b[0] & 0x0F
                if pq:
                    raise NotImplementedError("JPEG: 16-bit quant tables")
                qt[tq] = np.frombuffer(b[1:65], dtype=np.uint8).astype(np.int64)
                b = b[65:]
        elif marker == 0xC4:  # DHT
            b = body
            while b:
                tc, th = b[0] >> 4, b[0] & 0x0F
                bits = list(b[1:17])
                nv = sum(bits)
                vals = list(b[17 : 17 + nv])
                huff[(tc, th)] = _huff_lookup(bits, vals)
                b = b[17 + nv :]
        elif marker == 0xC0:  # SOF0
            prec, h, w, nc = struct.unpack(">BHHB", body[:6])
            if prec != 8:
                raise NotImplementedError("JPEG: only 8-bit precision")
            comps = []
            for i in range(nc):
                cid, samp, tq = body[6 + 3 * i : 9 + 3 * i]
                comps.append((cid, tq, samp >> 4, samp & 0x0F))
            samps = [(c[2], c[3]) for c in comps]
            if samps != [(1, 1)] * nc and samps != [(2, 2), (1, 1), (1, 1)]:
                raise NotImplementedError(
                    "JPEG: only 4:4:4 or 4:2:0 sampling"
                )
            sof = (h, w, comps)
        elif marker == 0xDD:  # DRI
            dri = struct.unpack(">H", body[:2])[0]
        elif marker == 0xDA:  # SOS
            ns = body[0]
            scan_comp = [(body[1 + 2 * i], body[2 + 2 * i]) for i in range(ns)]
            pos = pos + 2 + ln
            break
        pos += 2 + ln
    if sof is None or scan_comp is None:
        raise ValueError("JPEG: missing SOF/SOS")
    h, w, comps = sof
    if not h or not w:
        raise ValueError("JPEG: zero dimension")
    ncomp = len(comps)
    if ncomp not in (1, 3) or len(scan_comp) != ncomp:
        raise NotImplementedError("JPEG: only 1- or 3-component scans")

    br = _BitReader(blob, pos)
    sf = [(c[2], c[3]) for c in comps]
    max_h = max(s[0] for s in sf)
    max_v = max(s[1] for s in sf)
    mcu_rows = (h + 8 * max_v - 1) // (8 * max_v)
    mcu_cols = (w + 8 * max_h - 1) // (8 * max_h)
    planes = [
        np.zeros((mcu_rows * vi * 8, mcu_cols * hi * 8), dtype=np.uint8)
        for hi, vi in sf
    ]
    dc_tables, ac_tables, qtabs = [], [], []
    for ci in range(ncomp):
        td_ta = scan_comp[ci][1]
        dc_tables.append(huff[(0, td_ta >> 4)])
        ac_tables.append(huff[(1, td_ta & 0x0F)])
        qtabs.append(qt[comps[ci][1]])
    pred = [0] * ncomp
    unzz = np.empty(64, dtype=np.int64)
    mcu_i = 0
    for mr in range(mcu_rows):
        for mc in range(mcu_cols):
            if dri and mcu_i and mcu_i % dri == 0:
                br.restart()
                pred = [0] * ncomp
            mcu_i += 1
            for ci in range(ncomp):
                hi, vi = sf[ci]
                for by in range(vi):
                    for bx in range(hi):
                        zz = np.zeros(64, dtype=np.int64)
                        cat = _decode_sym(br, dc_tables[ci])
                        diff = _extend(br.read(cat), cat) if cat else 0
                        pred[ci] += diff
                        zz[0] = pred[ci]
                        k = 1
                        while k < 64:
                            sym = _decode_sym(br, ac_tables[ci])
                            if sym == 0x00:  # EOB
                                break
                            run, cat = sym >> 4, sym & 0x0F
                            if cat == 0:
                                if run != 15:
                                    raise ValueError("JPEG: bad AC symbol")
                                k += 16  # ZRL
                                continue
                            k += run
                            if k > 63:
                                raise ValueError("JPEG: AC index overflow")
                            zz[k] = _extend(br.read(cat), cat)
                            k += 1
                        unzz[ZIGZAG] = zz * qtabs[ci]
                        r0 = (mr * vi + by) * 8
                        c0 = (mc * hi + bx) * 8
                        planes[ci][r0 : r0 + 8, c0 : c0 + 8] = idct_block_int(
                            unzz.reshape(8, 8)
                        )
    # upsample subsampled components by replication (chroma sample for
    # pixel (r, c) is plane[r * vi // max_v][c * hi // max_h] — the
    # integer-exact nearest/floor rule the twin mirrors), then crop
    full = []
    for ci in range(ncomp):
        hi, vi = sf[ci]
        p = planes[ci]
        if (hi, vi) != (max_h, max_v):
            p = np.repeat(np.repeat(p, max_v // vi, axis=0), max_h // hi, axis=1)
        full.append(p[:h, :w])
    if ncomp == 1:
        return full[0][..., None]
    return ycbcr_to_rgb_int(full[0], full[1], full[2])
