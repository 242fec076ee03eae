"""Pure-numpy/stdlib media codecs for the multimodal stages.

This container ships no image/audio libraries (round-4 env probe: PIL,
cv2, imageio, skimage, torchvision, matplotlib all absent), so the
formats a data engine can decode WITHOUT a codec dependency are
implemented here for real — header parse to pixels/samples in numpy —
and only compression-requiring formats (JPEG/PNG/MP4...) remain behind
the documented stub seam in stages/multimodal.py:

    BMP  24-bit uncompressed (BI_RGB), bottom-up or top-down
    PPM  binary P6, maxval 255
    PNG  8-bit RGB / RGBA, non-interlaced, all five scanline filters
         (inflate + CRC via the stdlib zlib; Sub unfiltered as a
         per-channel cumsum, Up fully vectorized, Average/Paeth by
         scanline — their left-neighbor recurrence is sequential)
    WAV  RIFF PCM (8/16/32-bit int), any channel count

All decoders raise ``ValueError`` on anything outside that envelope so
the caller can fall back to the stub rather than mis-decode.
"""

from __future__ import annotations

import struct

import numpy as np

# ------------------------------------------------------------------ sniff


def sniff(payload: bytes) -> str | None:
    """'bmp' | 'ppm' | 'png' | 'jpg' | 'wav' | 'y4m' for payloads this
    package can decode, else None (codec-requiring or unknown format ->
    stub territory). JPEG decodes via the pure-numpy baseline codec in
    ``jpegcodec.py``; Y4M (YUV4MPEG2) is an uncompressed planar video
    container parsed right here."""
    if payload[:2] == b"BM":
        return "bmp"
    if payload[:2] == b"P6":
        return "ppm"
    if payload[:8] == b"\x89PNG\r\n\x1a\n":
        return "png"
    if payload[:3] == b"\xFF\xD8\xFF":
        return "jpg"
    if payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
        return "wav"
    if payload[:10] == b"YUV4MPEG2 ":
        return "y4m"
    return None


# -------------------------------------------------------------------- BMP

_BMP_FILE_HDR = struct.Struct("<2sIHHI")      # magic, size, res, res, offset
_BMP_INFO_HDR = struct.Struct("<IiiHHIIiiII")  # BITMAPINFOHEADER


def encode_bmp(img: np.ndarray) -> bytes:
    """(H, W, 3) uint8 RGB -> 24-bit uncompressed BMP bytes (bottom-up
    rows, BGR byte order, rows padded to 4 bytes — the classic layout)."""
    img = np.ascontiguousarray(img, dtype=np.uint8)
    h, w, c = img.shape
    if c != 3:
        raise ValueError("encode_bmp expects (H, W, 3)")
    stride = (w * 3 + 3) & ~3
    rows = np.zeros((h, stride), np.uint8)
    rows[:, :w * 3] = img[::-1, :, ::-1].reshape(h, w * 3)  # flip + BGR
    pix = rows.tobytes()
    off = _BMP_FILE_HDR.size + _BMP_INFO_HDR.size
    return (_BMP_FILE_HDR.pack(b"BM", off + len(pix), 0, 0, off)
            + _BMP_INFO_HDR.pack(40, w, h, 1, 24, 0, len(pix), 2835, 2835,
                                 0, 0)
            + pix)


def decode_bmp(data: bytes) -> np.ndarray:
    """24-bit BI_RGB BMP bytes -> (H, W, 3) uint8 RGB."""
    if data[:2] != b"BM" or len(data) < 54:
        raise ValueError("not a BMP")
    off = struct.unpack_from("<I", data, 10)[0]
    hdr_sz, w, h = struct.unpack_from("<Iii", data, 14)
    if hdr_sz < 40:
        raise ValueError("unsupported BMP header")
    planes, bpp, comp = struct.unpack_from("<HHI", data, 26)
    if bpp != 24 or comp != 0:
        raise ValueError("only 24-bit BI_RGB supported")
    bottom_up = h > 0
    h = abs(h)
    stride = (w * 3 + 3) & ~3
    pix = np.frombuffer(data, np.uint8, stride * h, off).reshape(h, stride)
    img = pix[:, :w * 3].reshape(h, w, 3)[:, :, ::-1]  # BGR -> RGB
    return img[::-1] if bottom_up else img.copy()


# -------------------------------------------------------------------- PPM


def encode_ppm(img: np.ndarray) -> bytes:
    """(H, W, 3) uint8 RGB -> binary P6 PPM bytes."""
    img = np.ascontiguousarray(img, dtype=np.uint8)
    h, w, c = img.shape
    if c != 3:
        raise ValueError("encode_ppm expects (H, W, 3)")
    return b"P6\n%d %d\n255\n" % (w, h) + img.tobytes()


def decode_ppm(data: bytes) -> np.ndarray:
    """Binary P6 PPM bytes -> (H, W, 3) uint8 RGB (maxval must be 255;
    whitespace/comment-tolerant header scan per the netpbm spec)."""
    if data[:2] != b"P6":
        raise ValueError("not a P6 PPM")
    vals, i = [], 2
    while len(vals) < 3:
        while i < len(data) and data[i:i + 1].isspace():
            i += 1
        if data[i:i + 1] == b"#":  # comment to end of line
            while i < len(data) and data[i] != 0x0A:
                i += 1
            continue
        j = i
        while j < len(data) and not data[j:j + 1].isspace():
            j += 1
        vals.append(int(data[i:j]))
        i = j
    i += 1  # single whitespace after maxval
    w, h, maxval = vals
    if maxval != 255:
        raise ValueError("only maxval 255 supported")
    return np.frombuffer(data, np.uint8, w * h * 3, i) \
        .reshape(h, w, 3).copy()


# -------------------------------------------------------------------- PNG

_PNG_MAGIC = b"\x89PNG\r\n\x1a\n"


def _png_chunk(tag: bytes, data: bytes) -> bytes:
    import zlib

    return (struct.pack(">I", len(data)) + tag + data
            + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF))


def _png_assemble(raw_scanlines: bytes, w: int, h: int,
                  color_type: int) -> bytes:
    """IHDR + one zlib-deflated IDAT + IEND around pre-filtered scanline
    bytes (each row: 1 filter-type byte + w*channels samples)."""
    import zlib

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    return (_PNG_MAGIC + _png_chunk(b"IHDR", ihdr)
            + _png_chunk(b"IDAT", zlib.compress(raw_scanlines, 6))
            + _png_chunk(b"IEND", b""))


def encode_png(img: np.ndarray) -> bytes:
    """(H, W, 3) RGB or (H, W, 4) RGBA uint8 -> 8-bit non-interlaced PNG
    (filter type 0 on every scanline — decoders must accept all five,
    encoders may emit any)."""
    img = np.ascontiguousarray(img, dtype=np.uint8)
    h, w, c = img.shape
    if c not in (3, 4):
        raise ValueError("encode_png expects (H, W, 3|4)")
    rows = np.zeros((h, 1 + w * c), np.uint8)
    rows[:, 1:] = img.reshape(h, w * c)
    return _png_assemble(rows.tobytes(), w, h, 2 if c == 3 else 6)


def decode_png(data: bytes) -> np.ndarray:
    """8-bit RGB/RGBA non-interlaced PNG bytes -> (H, W, 3|4) uint8.

    All five scanline filters are reconstructed: None/Up vectorized, Sub
    as a per-channel cumsum mod 256, Average/Paeth with a per-pixel loop
    along the row (their predictor reads the just-reconstructed left
    neighbor, an inherently sequential recurrence)."""
    import zlib

    if data[:8] != _PNG_MAGIC:
        raise ValueError("not a PNG")
    i, idat = 8, []
    w = h = ct = None
    interlace = 0
    while i + 8 <= len(data):
        ln, tag = struct.unpack_from(">I4s", data, i)
        i += 8
        payload = data[i:i + ln]
        i += ln + 4  # skip CRC
        if tag == b"IHDR":
            w, h, bitd, ct, _comp, _filt, interlace = \
                struct.unpack(">IIBBBBB", payload)
            if bitd != 8 or ct not in (2, 6):
                raise ValueError("only 8-bit RGB/RGBA PNGs supported")
            if interlace:
                raise ValueError("interlaced PNGs not supported")
        elif tag == b"IDAT":
            idat.append(payload)
        elif tag == b"IEND":
            break
    if w is None or not idat:
        raise ValueError("truncated PNG")
    c = 3 if ct == 2 else 4
    stride = w * c
    try:
        raw = zlib.decompress(b"".join(idat))
    except zlib.error as e:
        raise ValueError(f"bad PNG deflate stream: {e}") from None
    if len(raw) != h * (1 + stride):
        raise ValueError("PNG scanline size mismatch")
    arr = np.frombuffer(raw, np.uint8).reshape(h, 1 + stride)
    ftype, rows = arr[:, 0], arr[:, 1:]
    out = np.zeros((h, stride), np.uint8)
    prev = np.zeros(stride, np.uint8)
    for y in range(h):
        f, r = int(ftype[y]), rows[y]
        if f == 0:          # None
            cur = r.copy()
        elif f == 1:        # Sub: recon = raw + left -> per-channel cumsum
            cur = (r.reshape(w, c).astype(np.int64).cumsum(axis=0)
                   % 256).astype(np.uint8).reshape(stride)
        elif f == 2:        # Up (uint8 addition wraps mod 256)
            cur = r + prev
        elif f == 3:        # Average
            cur = np.empty(stride, np.uint8)
            for x in range(stride):
                left = int(cur[x - c]) if x >= c else 0
                cur[x] = (int(r[x]) + ((left + int(prev[x])) >> 1)) & 0xFF
        elif f == 4:        # Paeth
            cur = np.empty(stride, np.uint8)
            for x in range(stride):
                a = int(cur[x - c]) if x >= c else 0
                b = int(prev[x])
                cc = int(prev[x - c]) if x >= c else 0
                p = a + b - cc
                pa, pb, pc_ = abs(p - a), abs(p - b), abs(p - cc)
                pred = a if (pa <= pb and pa <= pc_) else \
                    (b if pb <= pc_ else cc)
                cur[x] = (int(r[x]) + pred) & 0xFF
        else:
            raise ValueError(f"unknown PNG filter type {f}")
        out[y] = cur
        prev = cur
    return out.reshape(h, w, c)


# -------------------------------------------------------------------- WAV


def encode_wav(samples: np.ndarray, rate: int) -> bytes:
    """int16 samples, shape (n,) mono or (n, ch) -> RIFF PCM WAV bytes."""
    import io
    import wave

    samples = np.asarray(samples, dtype="<i2")
    ch = 1 if samples.ndim == 1 else samples.shape[1]
    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(ch)
        wf.setsampwidth(2)
        wf.setframerate(rate)
        wf.writeframes(samples.tobytes())
    return buf.getvalue()


def decode_wav(data: bytes) -> tuple[np.ndarray, int]:
    """RIFF PCM WAV bytes -> (int16 samples (n,) or (n, ch), rate).
    8/16/32-bit integer PCM accepted; 8-bit is recentred, 32-bit is
    truncated to the top 16 bits."""
    import io
    import wave

    try:
        with wave.open(io.BytesIO(data), "rb") as wf:
            ch, width, rate = (wf.getnchannels(), wf.getsampwidth(),
                               wf.getframerate())
            raw = wf.readframes(wf.getnframes())
    except (wave.Error, EOFError, struct.error) as e:
        raise ValueError(f"not a PCM WAV: {e}") from None
    if width == 2:
        s = np.frombuffer(raw, "<i2")
    elif width == 1:
        s = (np.frombuffer(raw, np.uint8).astype(np.int16) - 128) << 8
    elif width == 4:
        s = (np.frombuffer(raw, "<i4") >> 16).astype(np.int16)
    else:
        raise ValueError(f"unsupported sample width {width}")
    if ch > 1:
        s = s.reshape(-1, ch)
    return s, rate


# -------------------------------------------------------------------- Y4M
#
# YUV4MPEG2: a plain-text stream header, then per frame a "FRAME\n"
# marker + raw planar YUV. No compression, so a data engine can parse it
# with numpy alone — it is the video analogue of BMP/PPM here. We encode
# C444 (full-res planes, full-range JFIF matrix for exact-ish RGB round
# trips) and decode C444 plus the 4:2:0 family (C420 / C420jpeg /
# C420mpeg2, chroma upsampled nearest).


def _y4m_header(data: bytes) -> tuple[dict, int]:
    end = data.find(b"\n")
    if end < 0:
        raise ValueError("truncated Y4M header")
    params: dict[str, str] = {}
    for tok in data[10:end].split(b" "):
        if tok:
            params[chr(tok[0])] = tok[1:].decode("ascii", "replace")
    return params, end + 1


def y4m_info(data: bytes) -> tuple[int, int, int]:
    """Y4M bytes -> (n_frames, width, height) from the header + stream
    length alone (no pixel decode — this is what frame_sampler uses)."""
    if data[:10] != b"YUV4MPEG2 ":
        raise ValueError("not a Y4M stream")
    params, off = _y4m_header(data)
    w, h = int(params["W"]), int(params["H"])
    colorspace = params.get("C", "420jpeg")
    if colorspace.startswith("444"):
        fsize = w * h * 3
    elif colorspace.startswith("420"):
        fsize = w * h + 2 * ((w + 1) // 2) * ((h + 1) // 2)
    else:
        raise ValueError(f"unsupported Y4M colorspace C{colorspace}")
    per = 6 + fsize  # b"FRAME\n" + planes (frame params unsupported)
    n = (len(data) - off) // per
    return n, w, h


def encode_y4m(frames: np.ndarray, fps: tuple[int, int] = (25, 1)) -> bytes:
    """(T, H, W, 3) uint8 RGB -> YUV4MPEG2 C444 bytes (full-range JFIF
    matrix; every plane full resolution, so decode is near-lossless)."""
    frames = np.ascontiguousarray(frames, dtype=np.uint8)
    if frames.ndim != 4 or frames.shape[-1] != 3:
        raise ValueError("encode_y4m expects (T, H, W, 3)")
    t, h, w, _ = frames.shape
    f = frames.astype(np.float64)
    r, g, b = f[..., 0], f[..., 1], f[..., 2]
    y = np.clip(0.299 * r + 0.587 * g + 0.114 * b, 0, 255)
    cb = np.clip(-0.168736 * r - 0.331264 * g + 0.5 * b + 128.0, 0, 255)
    cr = np.clip(0.5 * r - 0.418688 * g - 0.081312 * b + 128.0, 0, 255)
    out = bytearray(b"YUV4MPEG2 W%d H%d F%d:%d Ip A1:1 C444\n"
                    % (w, h, fps[0], fps[1]))
    for i in range(t):
        out += b"FRAME\n"
        out += y[i].astype(np.uint8).tobytes()
        out += cb[i].astype(np.uint8).tobytes()
        out += cr[i].astype(np.uint8).tobytes()
    return bytes(out)


def decode_y4m(data: bytes) -> np.ndarray:
    """YUV4MPEG2 bytes -> (T, H, W, 3) uint8 RGB. C444 and the C420
    family supported; chroma upsampled nearest for 4:2:0."""
    if data[:10] != b"YUV4MPEG2 ":
        raise ValueError("not a Y4M stream")
    params, off = _y4m_header(data)
    w, h = int(params["W"]), int(params["H"])
    colorspace = params.get("C", "420jpeg")
    is444 = colorspace.startswith("444")
    if not is444 and not colorspace.startswith("420"):
        raise ValueError(f"unsupported Y4M colorspace C{colorspace}")
    cw, ch = ((w, h) if is444 else ((w + 1) // 2, (h + 1) // 2))
    fsize = w * h + 2 * cw * ch
    frames = []
    i = off
    while i + 6 + fsize <= len(data):
        if data[i:i + 5] != b"FRAME":
            raise ValueError("Y4M frame marker desync")
        nl = data.find(b"\n", i)  # tolerate per-frame params
        i = nl + 1
        y = np.frombuffer(data, np.uint8, w * h, i) \
            .reshape(h, w).astype(np.float64)
        cb = np.frombuffer(data, np.uint8, cw * ch, i + w * h) \
            .reshape(ch, cw).astype(np.float64)
        cr = np.frombuffer(data, np.uint8, cw * ch, i + w * h + cw * ch) \
            .reshape(ch, cw).astype(np.float64)
        i += fsize
        if not is444:
            cb = np.repeat(np.repeat(cb, 2, 0), 2, 1)[:h, :w]
            cr = np.repeat(np.repeat(cr, 2, 0), 2, 1)[:h, :w]
        cb -= 128.0
        cr -= 128.0
        r = y + 1.402 * cr
        g = y - 0.344136 * cb - 0.714136 * cr
        b = y + 1.772 * cb
        frames.append(np.clip(np.stack([r, g, b], -1), 0, 255)
                      .astype(np.uint8))
    if not frames:
        raise ValueError("Y4M stream holds no complete frame")
    return np.stack(frames)


# --------------------------------------------------------------- kernels


def resize_nearest(img: np.ndarray, new_w: int, new_h: int) -> np.ndarray:
    """Nearest-neighbor resample (pixel-center sampling) — pure indexing,
    no interpolation kernel needed for dedup-grade features."""
    h, w = img.shape[:2]
    yi = np.minimum(((np.arange(new_h) + 0.5) * h / new_h)
                    .astype(np.int64), h - 1)
    xi = np.minimum(((np.arange(new_w) + 0.5) * w / new_w)
                    .astype(np.int64), w - 1)
    return img[yi][:, xi]


def image_features(img: np.ndarray, dim: int = 16) -> np.ndarray:
    """Deterministic real-pixel feature vector (dim=16): per-channel mean
    and std (6), 3x3 grid of gray block means (9), aspect ratio (1).
    Location-valued components are centered (mean - 0.5 etc.) so feature
    DIRECTIONS discriminate under cosine — uncentered means cluster at
    0.5 and make every image near-parallel to every other. Content-
    derived, so byte-identical images map to identical features at any
    batch size."""
    f = img.astype(np.float64) / 255.0
    h, w = f.shape[:2]
    gray = f.mean(axis=2)
    ys = np.linspace(0, h, 4).astype(np.int64)
    xs = np.linspace(0, w, 4).astype(np.int64)
    blocks = [gray[ys[i]:max(ys[i + 1], ys[i] + 1),
                   xs[j]:max(xs[j + 1], xs[j] + 1)].mean() - 0.5
              for i in range(3) for j in range(3)]
    out = np.concatenate([f.mean(axis=(0, 1)) - 0.5, f.std(axis=(0, 1)),
                          blocks, [w / (w + h) - 0.5]])
    if len(out) != dim:
        raise ValueError(f"feature dim mismatch: {len(out)} != {dim}")
    return out.astype(np.float32)


def audio_features(samples: np.ndarray, rate: int,
                   dim: int = 16) -> np.ndarray:
    """Deterministic audio feature vector (dim=16): rms, mean, std,
    zero-crossing rate (4) + 12 coarse log-energy spectrum bands."""
    s = np.asarray(samples, np.float64)
    if s.ndim > 1:
        s = s.mean(axis=1)
    s = s / 32768.0
    n = len(s)
    if n == 0:
        return np.zeros(dim, np.float32)
    zcr = float(np.mean(np.signbit(s[1:]) != np.signbit(s[:-1]))) \
        if n > 1 else 0.0
    spec = np.abs(np.fft.rfft(s))
    bands = np.array_split(spec, 12)
    # band energies centered to their own mean: the SHAPE of the spectrum
    # discriminates under cosine where absolute levels are near-constant
    be = np.log1p([float((b ** 2).sum()) for b in bands])
    be -= be.mean()
    out = np.concatenate([[float(np.sqrt((s ** 2).mean())), s.mean(),
                           s.std(), zcr - 0.5], be])
    if len(out) != dim:
        raise ValueError(f"feature dim mismatch: {len(out)} != {dim}")
    return out.astype(np.float32)


def video_features(frames: np.ndarray, dim: int = 16,
                   max_frames: int = 4) -> np.ndarray:
    """Deterministic video feature vector: the mean of ``image_features``
    over up to ``max_frames`` evenly-spaced frames. Content-derived and
    independent of batching, so byte-identical videos map to identical
    features — the invariant media_near_dup relies on."""
    t = frames.shape[0]
    idx = np.unique(np.linspace(0, t - 1, min(t, max_frames))
                    .astype(np.int64))
    feats = np.stack([image_features(frames[i], dim) for i in idx])
    return feats.mean(axis=0).astype(np.float32)
