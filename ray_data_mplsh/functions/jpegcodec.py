"""Pure-numpy/stdlib baseline JPEG codec (ITU-T T.81).

This container ships no image libraries (PIL/cv2/imageio absent — see
stages/multimodal.py's env probe), so JPEG support is implemented here
from the public spec: the encoder emits baseline sequential 4:4:4
(SOI/APP0/DQT/SOF0/DHT/SOS, Annex-K quantization + Huffman tables,
quality-scaled per the IJG rule), and the decoder handles the general
baseline envelope — 8-bit SOF0, 1 or 3 components, any sampling factors
up to 2x2 (4:4:4 / 4:2:2 / 4:2:0), multi-segment DQT/DHT, restart
markers (DRI/RSTn) — with the hot math (DCT/IDCT, dequantize, color
transforms) vectorized over all blocks at once.  Out-of-envelope
streams (progressive SOF2, 12-bit, arithmetic coding) raise
``ValueError`` so callers fall back to the documented stub.

Entropy coding is a per-block Python loop — fixture/diagnostic-grade
by design; a production deployment swaps the whole module for a codec
lib at the ``decode_payload`` seam without touching pipeline code.
"""

from __future__ import annotations

import struct

import numpy as np

# ------------------------------------------------------------- constants

_ZIGZAG = np.array([
    0,  1,  8, 16,  9,  2,  3, 10,
    17, 24, 32, 25, 18, 11,  4,  5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13,  6,  7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63], np.int64)
_UNZIGZAG = np.argsort(_ZIGZAG)

_QY = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99], np.float64)
_QC = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99], np.float64)

# Annex K Huffman specs: (BITS[1..16], HUFFVAL)
_DC_LUM = ([0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
           list(range(12)))
_DC_CHR = ([0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
           list(range(12)))
_AC_LUM = ([0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D], [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
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
_AC_CHR = ([0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77], [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
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

# 8x8 DCT-II basis (orthonormal): F = C @ B @ C.T, B = C.T @ F @ C
_u = np.arange(8)
_C = np.cos((2 * _u[None, :] + 1) * _u[:, None] * np.pi / 16) \
    * np.where(_u[:, None] == 0, np.sqrt(1 / 8), np.sqrt(2 / 8))


def _canonical_codes(bits, vals):
    """BITS/HUFFVAL -> {symbol: (code, length)} (spec C.2 code assignment)."""
    out, code = {}, 0
    i = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[vals[i]] = (code, length)
            code += 1
            i += 1
        code <<= 1
    return out


def _quality_tables(quality: int):
    """IJG quality scaling of the Annex-K tables (natural order)."""
    q = min(max(int(quality), 1), 100)
    scale = 5000 / q if q < 50 else 200 - 2 * q
    qy = np.clip(np.floor((_QY * scale + 50) / 100), 1, 255)
    qc = np.clip(np.floor((_QC * scale + 50) / 100), 1, 255)
    return qy, qc


# --------------------------------------------------------------- encoder


class _BitWriter:
    """MSB-first bit accumulator with 0xFF byte stuffing (spec F.1.2.3)."""

    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def put(self, code: int, length: int):
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            b = (self.acc >> (self.nbits - 8)) & 0xFF
            self.nbits -= 8
            self.acc &= (1 << self.nbits) - 1
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)

    def flush(self):
        if self.nbits:  # pad with 1-bits per spec
            pad = 8 - self.nbits
            self.put((1 << pad) - 1, pad)

    def restart(self, n: int):
        """Byte-align and emit RSTn (marker bytes are never stuffed)."""
        self.flush()
        self.out += bytes((0xFF, 0xD0 + (n & 7)))


def _block_split(plane: np.ndarray) -> np.ndarray:
    """(H, W) float, H/W multiples of 8 -> (n_blocks, 8, 8) row-major."""
    h, w = plane.shape
    return plane.reshape(h // 8, 8, w // 8, 8).transpose(0, 2, 1, 3) \
        .reshape(-1, 8, 8)


def _seg(marker: int, payload: bytes) -> bytes:
    return struct.pack(">BBH", 0xFF, marker, len(payload) + 2) + payload


def _put_block(bw, blk, pred, dc_codes, ac_codes) -> int:
    """Entropy-code one quantized zigzag block; returns the new DC pred."""
    diff = int(blk[0]) - pred
    size = abs(diff).bit_length()
    cd, ln = dc_codes[size]
    bw.put(cd, ln)
    if size:
        bw.put(diff if diff > 0 else diff + (1 << size) - 1, size)
    nz = np.flatnonzero(blk[1:])
    last = -1
    for k in nz:
        run = int(k) - last - 1
        last = int(k)
        while run >= 16:
            cd, ln = ac_codes[0xF0]
            bw.put(cd, ln)
            run -= 16
        v = int(blk[1 + k])
        size = abs(v).bit_length()
        cd, ln = ac_codes[(run << 4) | size]
        bw.put(cd, ln)
        bw.put(v if v > 0 else v + (1 << size) - 1, size)
    if last != 62:
        cd, ln = ac_codes[0x00]  # EOB
        bw.put(cd, ln)
    return int(blk[0])


def encode_jpeg(img: np.ndarray, quality: int = 90, *,
                subsample: bool = False,
                restart_interval: int = 0) -> bytes:
    """(H, W, 3) uint8 RGB -> baseline sequential JFIF JPEG.

    Default is 4:4:4 (no chroma subsampling, so near-dup features
    survive the round trip); ``subsample=True`` emits 4:2:0 (2x2 Y
    sampling, box-averaged chroma). ``restart_interval`` > 0 emits a DRI
    segment and RSTn markers every that-many MCUs — both options exist
    chiefly so the decoder's general-sampling and restart paths have
    honest in-repo test coverage."""
    img = np.ascontiguousarray(img, dtype=np.uint8)
    h, w, c = img.shape
    if c != 3:
        raise ValueError("encode_jpeg expects (H, W, 3)")
    f = img.astype(np.float64)
    r, g, b = f[..., 0], f[..., 1], f[..., 2]
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
    cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
    qy, qc = _quality_tables(quality)
    dc_y, ac_y = _canonical_codes(*_DC_LUM), _canonical_codes(*_AC_LUM)
    dc_c, ac_c = _canonical_codes(*_DC_CHR), _canonical_codes(*_AC_CHR)

    if subsample:
        samp = [(2, 2), (1, 1), (1, 1)]
        # pad to the 16x16 MCU grid, then box-average chroma 2x2
        ph, pw = -(-h // 16) * 16, -(-w // 16) * 16
        yp = np.pad(y, ((0, ph - h), (0, pw - w)), mode="edge")
        cbp = np.pad(cb, ((0, ph - h), (0, pw - w)), mode="edge") \
            .reshape(ph // 2, 2, pw // 2, 2).mean(axis=(1, 3))
        crp = np.pad(cr, ((0, ph - h), (0, pw - w)), mode="edge") \
            .reshape(ph // 2, 2, pw // 2, 2).mean(axis=(1, 3))
        planes = [yp, cbp, crp]
    else:
        samp = [(1, 1), (1, 1), (1, 1)]
        ph, pw = (h + 7) & ~7, (w + 7) & ~7
        planes = [np.pad(p, ((0, ph - h), (0, pw - w)), mode="edge")
                  for p in (y, cb, cr)]

    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)
    mcux, mcuy = pw // (8 * hmax), ph // (8 * vmax)
    qtabs = [qy, qc, qc]
    grids = []  # per component: zigzag blocks in (block-row, block-col) grid
    for ci, plane in enumerate(planes):
        blocks = _block_split(plane) - 128.0
        coef = np.einsum("ij,njk,lk->nil", _C, blocks, _C)
        q = np.round(coef / qtabs[ci].reshape(8, 8)).astype(np.int32)
        bw_blocks = plane.shape[1] // 8
        grids.append((q.reshape(-1, 64)[:, _ZIGZAG], bw_blocks))

    bw = _BitWriter()
    preds = [0, 0, 0]
    n_mcu = mcux * mcuy
    rst = 0
    for m in range(n_mcu):
        if restart_interval and m and m % restart_interval == 0:
            bw.restart(rst)
            rst = (rst + 1) & 7
            preds = [0, 0, 0]
        my, mx = divmod(m, mcux)
        for ci in range(3):
            hs, vs = samp[ci]
            zz, bw_blocks = grids[ci]
            dc_codes = dc_y if ci == 0 else dc_c
            ac_codes = ac_y if ci == 0 else ac_c
            for v in range(vs):
                for hh in range(hs):
                    blk = zz[(my * vs + v) * bw_blocks + (mx * hs + hh)]
                    preds[ci] = _put_block(bw, blk, preds[ci],
                                           dc_codes, ac_codes)
    bw.flush()

    def dht(tc, th, spec):
        bits, vals = spec
        return _seg(0xC4, bytes([tc << 4 | th]) + bytes(bits) + bytes(vals))

    out = bytearray(b"\xFF\xD8")                           # SOI
    out += _seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    out += _seg(0xDB, b"\x00" + bytes(qy[_ZIGZAG].astype(np.uint8)))
    out += _seg(0xDB, b"\x01" + bytes(qc[_ZIGZAG].astype(np.uint8)))
    sof = struct.pack(">BHHB", 8, h, w, 3)
    for k, (cid, tq) in enumerate(((1, 0), (2, 1), (3, 1))):
        sof += bytes([cid, samp[k][0] << 4 | samp[k][1], tq])
    out += _seg(0xC0, sof)
    out += dht(0, 0, _DC_LUM) + dht(1, 0, _AC_LUM)
    out += dht(0, 1, _DC_CHR) + dht(1, 1, _AC_CHR)
    if restart_interval:
        out += _seg(0xDD, struct.pack(">H", restart_interval))
    sos = bytes([3, 1, 0x00, 2, 0x11, 3, 0x11, 0, 63, 0])
    out += _seg(0xDA, sos)
    out += bw.out
    out += b"\xFF\xD9"                                     # EOI
    return bytes(out)


# --------------------------------------------------------------- decoder


class _HuffTable:
    """Spec F.16 canonical decode tables: MINCODE/MAXCODE/VALPTR."""

    def __init__(self, bits, vals):
        self.vals = np.asarray(vals, np.int64)
        self.mincode = np.zeros(17, np.int64)
        self.maxcode = np.full(17, -1, np.int64)
        self.valptr = np.zeros(17, np.int64)
        code, i = 0, 0
        for length in range(1, 17):
            if bits[length - 1]:
                self.valptr[length] = i
                self.mincode[length] = code
                code += bits[length - 1]
                i += bits[length - 1]
                self.maxcode[length] = code - 1
            code <<= 1


class _BitReader:
    """MSB-first reader over a pre-unstuffed numpy bit array."""

    def __init__(self, data: bytes):
        self.bits = np.unpackbits(np.frombuffer(data, np.uint8))
        self.pos = 0

    def read(self, n: int) -> int:
        b = self.bits[self.pos:self.pos + n]
        if len(b) < n:
            raise ValueError("truncated JPEG entropy stream")
        self.pos += n
        v = 0
        for x in b:
            v = (v << 1) | int(x)
        return v

    def decode(self, tab: _HuffTable) -> int:
        code = 0
        bits, pos = self.bits, self.pos
        for length in range(1, 17):
            if pos >= len(bits):
                raise ValueError("truncated JPEG entropy stream")
            code = (code << 1) | int(bits[pos])
            pos += 1
            if code <= tab.maxcode[length]:
                self.pos = pos
                return int(tab.vals[tab.valptr[length]
                                    + code - tab.mincode[length]])
        raise ValueError("invalid JPEG Huffman code")

    def receive_extend(self, size: int) -> int:
        if size == 0:
            return 0
        v = self.read(size)
        return v if v >= (1 << (size - 1)) else v - (1 << size) + 1

    def align(self):
        self.pos = (self.pos + 7) & ~7


def _unstuff(data: bytes) -> bytes:
    """Drop the 0x00 after each 0xFF and any RSTn marker bytes."""
    arr = np.frombuffer(data, np.uint8)
    ff = arr == 0xFF
    nxt = np.roll(arr, -1)
    nxt[-1] = 0
    drop = np.zeros(len(arr), bool)
    drop[1:] |= (ff[:-1] & (nxt[:-1] == 0))[...]  # the stuffed 0x00
    is_rst = ff & (nxt >= 0xD0) & (nxt <= 0xD7)
    drop |= is_rst                                 # the 0xFF of RSTn
    drop[1:] |= is_rst[:-1]                        # the Dn byte
    return arr[~drop].tobytes()


def decode_jpeg(data: bytes) -> np.ndarray:
    """Baseline sequential JPEG bytes -> (H, W, 3) uint8 RGB (grayscale
    streams are broadcast to 3 channels). Envelope: 8-bit SOF0, 1 or 3
    components, sampling factors <= 2, single interleaved scan; restart
    markers tolerated (DC predictors reset per spec F.2.1.3.1)."""
    if data[:2] != b"\xFF\xD8":
        raise ValueError("not a JPEG")
    qtabs: dict[int, np.ndarray] = {}
    htabs: dict[tuple[int, int], _HuffTable] = {}
    comps = None
    h = w = 0
    restart_interval = 0
    i = 2
    scan = None
    while i + 4 <= len(data):
        if data[i] != 0xFF:
            raise ValueError("JPEG marker desync")
        marker = data[i + 1]
        if marker == 0xD9:  # EOI
            break
        ln = struct.unpack_from(">H", data, i + 2)[0]
        payload = data[i + 4:i + 2 + ln]
        i += 2 + ln
        if marker == 0xDB:  # DQT (may hold several tables)
            j = 0
            while j < len(payload):
                pq, tq = payload[j] >> 4, payload[j] & 0xF
                if pq != 0:
                    raise ValueError("16-bit quant tables unsupported")
                qtabs[tq] = np.frombuffer(
                    payload, np.uint8, 64, j + 1).astype(np.float64)[
                        _UNZIGZAG]
                j += 65
        elif marker == 0xC4:  # DHT (may hold several tables)
            j = 0
            while j < len(payload):
                tc, th = payload[j] >> 4, payload[j] & 0xF
                bits = list(payload[j + 1:j + 17])
                n = sum(bits)
                vals = list(payload[j + 17:j + 17 + n])
                htabs[(tc, th)] = _HuffTable(bits, vals)
                j += 17 + n
        elif marker == 0xC0 or marker == 0xC1:  # SOF0/1 (baseline)
            prec, h, w, nc = struct.unpack_from(">BHHB", payload, 0)
            if prec != 8:
                raise ValueError("only 8-bit JPEG supported")
            if nc not in (1, 3):
                raise ValueError(f"unsupported component count {nc}")
            comps = []
            for k in range(nc):
                cid, hv, tq = payload[6 + 3 * k:9 + 3 * k]
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 0xF,
                              "tq": tq})
            if any(c["h"] > 2 or c["v"] > 2 or c["h"] < 1 or c["v"] < 1
                   for c in comps):
                raise ValueError("sampling factors beyond 2x2 unsupported")
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                        0xCD, 0xCE, 0xCF):
            raise ValueError("non-baseline JPEG (progressive/arithmetic)")
        elif marker == 0xDD:  # DRI
            restart_interval = struct.unpack(">H", payload)[0]
        elif marker == 0xDA:  # SOS — entropy data follows to EOI
            ns = payload[0]
            scan = []
            for k in range(ns):
                cs, tt = payload[1 + 2 * k], payload[2 + 2 * k]
                scan.append((cs, tt >> 4, tt & 0xF))
            # entropy segment: up to the next non-RST marker
            j = i
            while j + 1 < len(data):
                if data[j] == 0xFF and data[j + 1] not in (0x00,) \
                        and not (0xD0 <= data[j + 1] <= 0xD7):
                    break
                j += 1
            entropy = data[i:j]
            i = j
            break
        # APPn / COM / others: skipped via ln
    if comps is None or scan is None:
        raise ValueError("truncated JPEG (no SOF/SOS)")
    if len(scan) != len(comps):
        raise ValueError("non-interleaved JPEG scans unsupported")

    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    for c in comps:
        c["bw"] = mcux * c["h"]         # blocks per row, padded to MCU grid
        c["bh"] = mcuy * c["v"]
        c["coef"] = np.zeros((c["bh"] * c["bw"], 64), np.float64)
    by_id = {c["id"]: c for c in comps}
    order = []
    for cs, td, ta in scan:
        c = by_id[cs]
        order.append((c, htabs[(0, td)], htabs[(1, ta)]))

    br = _BitReader(_unstuff(entropy))
    preds = {c["id"]: 0 for c in comps}
    n_mcu = mcux * mcuy
    for m in range(n_mcu):
        if restart_interval and m and m % restart_interval == 0:
            br.align()                  # RSTn bytes already stripped
            for k in preds:
                preds[k] = 0
        my, mx = divmod(m, mcux)
        for c, dct, act in order:
            for v in range(c["v"]):
                for hh in range(c["h"]):
                    blk = np.zeros(64, np.float64)
                    t = br.decode(dct)
                    diff = br.receive_extend(t)
                    preds[c["id"]] += diff
                    blk[0] = preds[c["id"]]
                    k = 1
                    while k < 64:
                        rs = br.decode(act)
                        r, s = rs >> 4, rs & 0xF
                        if s == 0:
                            if r == 15:
                                k += 16
                                continue
                            break       # EOB
                        k += r
                        if k > 63:
                            raise ValueError("AC coefficient overflow")
                        blk[k] = br.receive_extend(s)
                        k += 1
                    by = my * c["v"] + v
                    bx = mx * c["h"] + hh
                    c["coef"][by * c["bw"] + bx] = blk

    planes = []
    for c in comps:
        q = qtabs[c["tq"]]
        # stored coefs are zigzag-ordered; dequantize in that order, then
        # scatter back to natural order before the IDCT
        coef = (c["coef"] * q[_ZIGZAG])[:, _UNZIGZAG].reshape(-1, 8, 8)
        pix = np.einsum("ji,njk,kl->nil", _C, coef, _C) + 128.0
        bh, bw_ = c["bh"], c["bw"]
        plane = pix.reshape(bh, bw_, 8, 8).transpose(0, 2, 1, 3) \
            .reshape(bh * 8, bw_ * 8)
        # upsample to full MCU-grid resolution, then crop to (h, w)
        plane = np.repeat(np.repeat(plane, vmax // c["v"], axis=0),
                          hmax // c["h"], axis=1)
        planes.append(plane[:h, :w])
    if len(planes) == 1:
        y = np.clip(planes[0], 0, 255)
        return np.repeat(y[..., None], 3, axis=2).astype(np.uint8)
    y, cb, cr = planes[0], planes[1] - 128.0, planes[2] - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    return np.clip(np.stack([r, g, b], axis=-1), 0, 255).astype(np.uint8)
