"""Baseline JPEG (ITU-T T.81 sequential DCT) codec in pure numpy/stdlib —
the third vendored raster codec next to BMP and PNG (multimodal.py), so a
Pillow-less cluster can decode the dominant crawled-image format.

Scope (declared, loud — the repo's honest-contract style):
* decode: baseline sequential DCT, 8-bit, grayscale / YCbCr 3-component,
  4:4:4 and 4:2:0 chroma subsampling, restart markers (DRI/RSTn).
  Progressive (SOF2), arithmetic coding, 12-bit, CMYK and fancy APPn
  color transforms raise ``NotImplementedError`` — never a silent
  mis-decode.
* encode: the matching baseline subset (4:4:4 or 4:2:0, optional
  restart interval, Annex-K standard Huffman tables, quantization
  tables scaled from the Annex-K luminance/chrominance matrices by a
  libjpeg-style quality factor; quality=100 → all-ones tables, making
  the round-trip exact up to DCT coefficient rounding — the property
  the tests pin).

Correctness anchors (tests/test_pipeline_ops.py): a flat image
round-trips EXACTLY (single quantized DC coefficient, no AC); a pure
cosine-basis image concentrates its energy on the matching DCT
coefficient (the standard's own math as the external reference); random
images at quality=100 round-trip within ±2 LSB; 4:2:0 keeps luma
near-exact while chroma averages 2x2; restart markers decode to the
same pixels as the unsegmented stream.

Performance contract: the entropy coder is a per-symbol Python loop —
fine for the thumbnail-sized payloads the multimodal path handles
per-row inside mapInPandas batches (the surrounding Spark plumbing,
not this codec, is the 100 TB story; a real cluster swaps in
libjpeg-turbo via Pillow through the same ``decoder=`` hook).
"""

from __future__ import annotations

import struct

import numpy as np

# ---------------------------------------------------------------------------
# tables (ITU-T T.81 Annex K)
# ---------------------------------------------------------------------------

ZIGZAG = np.array([
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
], dtype=np.int64)

Q_LUMA = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
], dtype=np.int64).reshape(8, 8)

Q_CHROMA = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
], dtype=np.int64).reshape(8, 8)

# Annex K Huffman specs: (BITS counts per code length 1..16, HUFFVAL)
DC_LUMA_SPEC = ([0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
                list(range(12)))
DC_CHROMA_SPEC = ([0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
                  list(range(12)))
AC_LUMA_SPEC = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
    [0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
     0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
     0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
     0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
     0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
     0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
     0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
     0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
     0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
     0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
     0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
     0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
     0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
     0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
     0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA])
AC_CHROMA_SPEC = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77],
    [0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
     0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14,
     0x42, 0x91, 0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15,
     0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17,
     0x18, 0x19, 0x1A, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37,
     0x38, 0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A,
     0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65,
     0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
     0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A,
     0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
     0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5,
     0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
     0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9,
     0xDA, 0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2,
     0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA])

# orthonormal 8-point DCT-II basis: dct = C @ block @ C.T
_C = np.zeros((8, 8))
for _k in range(8):
    for _n in range(8):
        _C[_k, _n] = np.cos((2 * _n + 1) * _k * np.pi / 16)
_C *= 0.5
_C[0, :] *= 1.0 / np.sqrt(2.0)


def _huff_codes(spec):
    """(BITS, HUFFVAL) → {symbol: (code, length)} (T.81 C.2 canonical)."""
    bits, vals = spec
    out, code, i = {}, 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[vals[i]] = (code, length)
            code += 1
            i += 1
        code <<= 1
    return out


def _huff_decode_table(spec):
    """(BITS, HUFFVAL) → {(length, code): symbol} for the bit reader."""
    enc = _huff_codes(spec)
    return {(ln, code): sym for sym, (code, ln) in enc.items()}


def quant_tables(quality: int = 100):
    """libjpeg-style quality scaling of the Annex-K tables; quality=100
    yields all-ones (near-lossless, the round-trip-test regime)."""
    if not 1 <= quality <= 100:
        raise ValueError(f"quality must be 1..100: {quality}")
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    def s(tbl):
        q = (tbl * scale + 50) // 100
        return np.clip(q, 1, 255).astype(np.int64)
    return s(Q_LUMA), s(Q_CHROMA)


# ---------------------------------------------------------------------------
# bit IO
# ---------------------------------------------------------------------------

class _BitWriter:
    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int):
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            byte = (self.acc >> (self.nbits - 8)) & 0xFF
            self.buf.append(byte)
            if byte == 0xFF:          # byte stuffing
                self.buf.append(0x00)
            self.nbits -= 8
        self.acc &= (1 << self.nbits) - 1

    def pad_to_byte(self):
        if self.nbits:
            self.write(0x7F, 8 - self.nbits)  # pad with 1-bits


class _BitReader:
    """Reads entropy-coded bits, unstuffing 0xFF00 and stopping at
    markers; RSTn markers are consumed via ``sync_restart``."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.acc = 0
        self.nbits = 0

    def _fill(self):
        d = self.data
        if self.pos >= len(d):
            raise ValueError("truncated JPEG entropy stream")
        b = d[self.pos]
        if b == 0xFF:
            nxt = d[self.pos + 1] if self.pos + 1 < len(d) else None
            if nxt == 0x00:
                self.pos += 2
            elif nxt is not None and 0xD0 <= nxt <= 0xD7:
                raise _RestartPending()
            else:
                raise ValueError("unexpected marker inside entropy data")
        else:
            self.pos += 1
        self.acc = (self.acc << 8) | b
        self.nbits += 8

    def bit(self) -> int:
        if self.nbits == 0:
            self._fill()
        self.nbits -= 1
        return (self.acc >> self.nbits) & 1

    def receive(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.bit()
        return v

    def sync_restart(self):
        """Consume an RSTn marker and realign to a byte boundary."""
        self.acc = 0
        self.nbits = 0
        d = self.data
        while self.pos + 1 < len(d) and not (
                d[self.pos] == 0xFF and 0xD0 <= d[self.pos + 1] <= 0xD7):
            self.pos += 1
        if self.pos + 1 >= len(d):
            raise ValueError("expected restart marker")
        self.pos += 2


class _RestartPending(Exception):
    pass


def _huff_read(r: _BitReader, table) -> int:
    code, length = 0, 0
    while length < 16:
        code = (code << 1) | r.bit()
        length += 1
        sym = table.get((length, code))
        if sym is not None:
            return sym
    raise ValueError("invalid Huffman code")


def _extend(v: int, t: int) -> int:
    """T.81 F.2.2.1 EXTEND: magnitude bits → signed value."""
    return v if t == 0 or v >= (1 << (t - 1)) else v - (1 << t) + 1


def _category(v: int) -> int:
    return int(v).bit_length() if v > 0 else int(-v).bit_length()


# ---------------------------------------------------------------------------
# encoder
# ---------------------------------------------------------------------------

def _rgb_to_ycbcr(rgb: np.ndarray) -> np.ndarray:
    m = np.array([[0.299, 0.587, 0.114],
                  [-0.168736, -0.331264, 0.5],
                  [0.5, -0.418688, -0.081312]])
    ycc = rgb.astype(np.float64) @ m.T
    ycc[:, :, 1:] += 128.0
    return ycc


def _ycbcr_to_rgb(ycc: np.ndarray) -> np.ndarray:
    y = ycc[:, :, 0]
    cb = ycc[:, :, 1] - 128.0
    cr = ycc[:, :, 2] - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    return np.clip(np.round(np.stack([r, g, b], axis=2)), 0, 255) \
        .astype(np.uint8)


def _pad_to(img: np.ndarray, mh: int, mw: int) -> np.ndarray:
    h, w = img.shape
    ph, pw = (-h) % mh, (-w) % mw
    return np.pad(img, ((0, ph), (0, pw)), mode="edge")


def _encode_block(w: _BitWriter, block: np.ndarray, q: np.ndarray,
                  dc_tab, ac_tab, pred: int) -> int:
    coef = _C @ (block - 128.0) @ _C.T
    qc = np.round(coef / q).astype(np.int64)
    zz = qc.flatten()[ZIGZAG]
    diff = int(zz[0]) - pred
    t = _category(diff)
    code, ln = dc_tab[t]
    w.write(code, ln)
    if t:
        w.write(diff if diff >= 0 else diff + (1 << t) - 1, t)
    run = 0
    last_nz = int(np.max(np.nonzero(zz)[0])) if np.any(zz[1:]) else 0
    for i in range(1, 64):
        v = int(zz[i])
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, ln = ac_tab[0xF0]     # ZRL
            w.write(code, ln)
            run -= 16
        t = _category(v)
        code, ln = ac_tab[(run << 4) | t]
        w.write(code, ln)
        w.write(v if v >= 0 else v + (1 << t) - 1, t)
        run = 0
        if i == last_nz:
            break
    if last_nz < 63:
        code, ln = ac_tab[0x00]          # EOB
        w.write(code, ln)
    return int(zz[0])


def jpeg_encode(arr: np.ndarray, quality: int = 100,
                subsample: bool = False, restart_interval: int = 0) -> bytes:
    """(h,w) grayscale or (h,w,3) RGB uint8 → baseline JFIF bytes.
    ``subsample=True`` writes 4:2:0 chroma (2x2-mean downsample);
    ``restart_interval`` (in MCUs) emits DRI + RSTn markers."""
    a = np.asarray(arr, dtype=np.uint8)
    gray = a.ndim == 2
    h, w0 = a.shape[:2]
    ql, qc = quant_tables(quality)
    dc_l, ac_l = _huff_codes(DC_LUMA_SPEC), _huff_codes(AC_LUMA_SPEC)
    dc_c, ac_c = _huff_codes(DC_CHROMA_SPEC), _huff_codes(AC_CHROMA_SPEC)

    if gray:
        planes = [a.astype(np.float64)]
        samp = [(1, 1)]
        qmap, dcm, acm = [ql], [dc_l], [ac_l]
    else:
        ycc = _rgb_to_ycbcr(a)
        y, cb, cr = ycc[:, :, 0], ycc[:, :, 1], ycc[:, :, 2]
        if subsample:
            yp = _pad_to(y, 16, 16)
            cbp = _pad_to(cb, 16, 16)
            crp = _pad_to(cr, 16, 16)
            cb2 = cbp.reshape(cbp.shape[0] // 2, 2,
                              cbp.shape[1] // 2, 2).mean(axis=(1, 3))
            cr2 = crp.reshape(crp.shape[0] // 2, 2,
                              crp.shape[1] // 2, 2).mean(axis=(1, 3))
            planes = [yp, cb2, cr2]
            samp = [(2, 2), (1, 1), (1, 1)]
        else:
            planes = [y, cb, cr]
            samp = [(1, 1), (1, 1), (1, 1)]
        qmap = [ql, qc, qc]
        dcm, acm = [dc_l, dc_c, dc_c], [ac_l, ac_c, ac_c]

    hmax = max(sx for sx, _ in samp)
    vmax = max(sy for _, sy in samp)
    planes = [_pad_to(p, 8 * sy, 8 * sx)
              for p, (sx, sy) in zip(planes, samp)]

    out = bytearray(b"\xff\xd8")                      # SOI
    out += b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00" \
        + struct.pack(">HHBB", 1, 1, 0, 0)            # APP0
    for tid, q in enumerate([ql] if gray else [ql, qc]):
        out += b"\xff\xdb" + struct.pack(">HB", 67, tid) \
            + bytes(int(x) for x in q.flatten()[ZIGZAG])
    nc = 1 if gray else 3
    out += b"\xff\xc0" + struct.pack(">HBHHB", 8 + 3 * nc, 8, h, w0, nc)
    for cid in range(nc):
        sx, sy = samp[cid]
        out += bytes([cid + 1, (sx << 4) | sy, 0 if cid == 0 else 1])
    specs = ([(0x00, DC_LUMA_SPEC), (0x10, AC_LUMA_SPEC)] if gray else
             [(0x00, DC_LUMA_SPEC), (0x10, AC_LUMA_SPEC),
              (0x01, DC_CHROMA_SPEC), (0x11, AC_CHROMA_SPEC)])
    for tc_th, (bits, vals) in specs:
        out += b"\xff\xc4" + struct.pack(">HB", 19 + len(vals), tc_th) \
            + bytes(bits) + bytes(vals)
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)
    out += b"\xff\xda" + struct.pack(">HB", 6 + 2 * nc, nc)
    for cid in range(nc):
        out += bytes([cid + 1,
                      0x00 if cid == 0 else 0x11])
    out += bytes([0, 63, 0])

    bw = _BitWriter()
    mcu_w = 8 * hmax
    mcu_h = 8 * vmax
    mcus_x = planes[0].shape[1] // (8 * samp[0][0]) \
        if gray else (planes[0].shape[1] + mcu_w - 1) // mcu_w
    mcus_y = planes[0].shape[0] // (8 * samp[0][1]) \
        if gray else (planes[0].shape[0] + mcu_h - 1) // mcu_h
    if gray:
        mcus_x = planes[0].shape[1] // 8
        mcus_y = planes[0].shape[0] // 8
    preds = [0] * nc
    mcu_count = 0
    rst = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_interval and mcu_count and \
                    mcu_count % restart_interval == 0:
                bw.pad_to_byte()
                bw.buf += bytes([0xFF, 0xD0 + rst])
                rst = (rst + 1) % 8
                preds = [0] * nc
            for cid in range(nc):
                sx, sy = samp[cid]
                for by in range(sy):
                    for bx in range(sx):
                        py = (my * sy + by) * 8
                        px = (mx * sx + bx) * 8
                        blk = planes[cid][py:py + 8, px:px + 8]
                        preds[cid] = _encode_block(
                            bw, blk, qmap[cid], dcm[cid], acm[cid],
                            preds[cid])
            mcu_count += 1
    bw.pad_to_byte()
    out += bw.buf
    out += b"\xff\xd9"                                # EOI
    return bytes(out)


# ---------------------------------------------------------------------------
# decoder
# ---------------------------------------------------------------------------

def jpeg_decode(payload: bytes, kind: str = "image") -> np.ndarray:
    """Baseline JFIF bytes → (h,w) grayscale or (h,w,3) RGB uint8."""
    d = payload
    if len(d) < 4 or d[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload")
    pos = 2
    qt: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], dict] = {}
    restart_interval = 0
    frame = None
    while pos + 4 <= len(d):
        if d[pos] != 0xFF:
            raise ValueError(f"bad marker alignment at {pos}")
        marker = d[pos + 1]
        if marker == 0xD9:
            break
        seglen = struct.unpack_from(">H", d, pos + 2)[0]
        body = d[pos + 4: pos + 2 + seglen]
        if marker == 0xDB:
            i = 0
            while i < len(body):
                pq, tq = body[i] >> 4, body[i] & 0xF
                if pq != 0:
                    raise NotImplementedError("16-bit quant tables")
                tbl = np.zeros(64, dtype=np.int64)
                tbl[ZIGZAG] = np.frombuffer(body[i + 1:i + 65], np.uint8)
                qt[tq] = tbl.reshape(8, 8)
                i += 65
        elif marker == 0xC4:
            i = 0
            while i < len(body):
                tc, th = body[i] >> 4, body[i] & 0xF
                bits = list(body[i + 1:i + 17])
                n = sum(bits)
                vals = list(body[i + 17:i + 17 + n])
                huff[(tc, th)] = _huff_decode_table((bits, vals))
                i += 17 + n
        elif marker == 0xC0 or marker == 0xC1:
            prec, fh, fw, nc = struct.unpack_from(">BHHB", body, 0)
            if prec != 8:
                raise NotImplementedError(f"{prec}-bit precision")
            comps = []
            for c in range(nc):
                cid, hv, tq = body[6 + 3 * c:9 + 3 * c]
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 0xF,
                              "tq": tq})
            frame = (fh, fw, comps)
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7,
                        0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                f"non-baseline JPEG (SOF marker 0x{marker:02X}): only "
                "sequential baseline DCT is decoded here")
        elif marker == 0xDD:
            restart_interval = struct.unpack_from(">H", body, 0)[0]
        elif marker == 0xDA:
            if frame is None:
                raise ValueError("SOS before SOF")
            ns = body[0]
            scan = []
            for c in range(ns):
                cs, tdta = body[1 + 2 * c], body[2 + 2 * c]
                scan.append((cs, tdta >> 4, tdta & 0xF))
            data_pos = pos + 2 + seglen
            return _decode_scan(d, data_pos, frame, scan, qt, huff,
                                restart_interval)
        pos += 2 + seglen
    raise ValueError("no scan data found")


def _decode_scan(d, pos, frame, scan, qt, huff, restart_interval):
    fh, fw, comps = frame
    nc = len(comps)
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    if nc not in (1, 3):
        raise NotImplementedError(f"{nc}-component JPEG")
    for c in comps:
        if (c["h"], c["v"]) not in ((1, 1), (2, 2)):
            raise NotImplementedError(
                f"sampling {c['h']}x{c['v']} unsupported (4:4:4/4:2:0 only)")
    mcu_w, mcu_h = 8 * hmax, 8 * vmax
    mcus_x = (fw + mcu_w - 1) // mcu_w
    mcus_y = (fh + mcu_h - 1) // mcu_h
    planes = [np.zeros((mcus_y * c["v"] * 8, mcus_x * c["h"] * 8))
              for c in comps]
    by_id = {c["id"]: i for i, c in enumerate(comps)}
    tabs = []
    for cs, td, ta in scan:
        i = by_id[cs]
        tabs.append((i, huff[(0, td)], huff[(1, ta)]))

    r = _BitReader(d, pos)
    preds = [0] * nc
    mcu_count = 0
    zz = np.zeros(64, dtype=np.int64)
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_interval and mcu_count and \
                    mcu_count % restart_interval == 0:
                r.sync_restart()
                preds = [0] * nc
            for i, dct_tab, ac_tab in tabs:
                c = comps[i]
                for by in range(c["v"]):
                    for bx in range(c["h"]):
                        zz[:] = 0
                        try:
                            t = _huff_read(r, dct_tab)
                            diff = _extend(r.receive(t), t) if t else 0
                            preds[i] += diff
                            zz[0] = preds[i]
                            k = 1
                            while k < 64:
                                rs = _huff_read(r, ac_tab)
                                rr, ssss = rs >> 4, rs & 0xF
                                if ssss == 0:
                                    if rr == 15:
                                        k += 16
                                        continue
                                    break          # EOB
                                k += rr
                                if k > 63:
                                    raise ValueError("AC run overflow")
                                zz[k] = _extend(r.receive(ssss), ssss)
                                k += 1
                        except _RestartPending:
                            raise ValueError(
                                "restart marker hit mid-block (corrupt "
                                "stream or wrong restart interval)")
                        coef = np.zeros(64)
                        coef[ZIGZAG] = zz * qt[c["tq"]].flatten()[ZIGZAG]
                        blk = _C.T @ coef.reshape(8, 8) @ _C + 128.0
                        py = (my * c["v"] + by) * 8
                        px = (mx * c["h"] + bx) * 8
                        planes[i][py:py + 8, px:px + 8] = blk
            mcu_count += 1

    if nc == 1:
        return np.clip(np.round(planes[0][:fh, :fw]), 0, 255) \
            .astype(np.uint8)
    ups = []
    for c, p in zip(comps, planes):
        if (c["h"], c["v"]) != (hmax, vmax):
            p = np.repeat(np.repeat(p, vmax // c["v"], axis=0),
                          hmax // c["h"], axis=1)
        ups.append(p[:fh, :fw])
    return _ycbcr_to_rgb(np.stack(ups, axis=2))
