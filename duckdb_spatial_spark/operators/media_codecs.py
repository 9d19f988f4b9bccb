"""Pure-python/numpy media codecs for the multimodal tier.

The container ships no image/audio libraries, but several public formats
are trivially decodable with numpy + the stdlib, which makes the decode
core of the multimodal operators REAL (not stubbed) for uncompressed
payloads:

* **BMP** (BITMAPINFOHEADER, 24/32-bit uncompressed) — spec is public.
* **PPM/PGM** (netpbm P6/P5 binary) — the classic interchange format.
* **PNG** (8-bit, non-interlaced; gray/RGB/palette/alpha) — stdlib zlib
  inflate + per-scanline unfilter (None/Sub/Up/Average/Paeth).
* **WAV** (PCM) — stdlib ``wave`` module.
* **RAWV** — a minimal raw-video container for frame plumbing:
  ``b'RAWV' + u16 w + u16 h + u16 nframes`` then nframes × w·h·3 RGB bytes.

Formats needing real codec libraries (JPEG/MP3/MP4…) still raise
NotImplementedError with a clear message.
"""

from __future__ import annotations

import io
import struct
import wave
from typing import List, Tuple

import numpy as np


def decode_image(payload: bytes) -> np.ndarray:
    """(h, w, 3) uint8 RGB from BMP / PPM (P6) / PGM (P5) bytes."""
    if payload[:2] == b"BM":
        return _decode_bmp(payload)
    if payload[:2] in (b"P6", b"P5"):
        return _decode_pnm(payload)
    if payload[:3] == b"\xff\xd8\xff":
        raise NotImplementedError(
            "JPEG decode requires a codec library not present in this "
            "container; pass decode_fn=..."
        )
    if payload[:8] == b"\x89PNG\r\n\x1a\n":
        return _decode_png(payload)
    raise ValueError("unrecognized image payload (native: BMP, PPM, PGM, PNG)")


def _decode_bmp(b: bytes) -> np.ndarray:
    if len(b) < 54:
        raise ValueError("truncated BMP")
    data_off = struct.unpack_from("<I", b, 10)[0]
    hdr_size = struct.unpack_from("<I", b, 14)[0]
    if hdr_size < 40:
        raise ValueError("unsupported BMP header")
    w, h = struct.unpack_from("<ii", b, 18)
    bpp = struct.unpack_from("<H", b, 28)[0]
    comp = struct.unpack_from("<I", b, 30)[0]
    if comp != 0 or bpp not in (24, 32):
        raise NotImplementedError("only uncompressed 24/32-bit BMP")
    flip = h > 0
    h = abs(h)
    nch = bpp // 8
    stride = (w * nch + 3) & ~3
    rows = []
    for r in range(h):
        off = data_off + r * stride
        row = np.frombuffer(b, dtype=np.uint8, count=w * nch, offset=off)
        rows.append(row.reshape(w, nch))
    img = np.stack(rows[::-1] if flip else rows)
    # BMP stores BGR(A) → RGB
    return np.ascontiguousarray(img[:, :, [2, 1, 0]])


def _decode_pnm(b: bytes) -> np.ndarray:
    # header: magic, whitespace/comments, width, height, maxval, single ws
    pos = 2
    vals = []
    while len(vals) < 3:
        while pos < len(b) and b[pos:pos + 1].isspace():
            pos += 1
        if b[pos:pos + 1] == b"#":
            while pos < len(b) and b[pos] != 0x0A:
                pos += 1
            continue
        start = pos
        while pos < len(b) and not b[pos:pos + 1].isspace():
            pos += 1
        vals.append(int(b[start:pos]))
    pos += 1  # the single whitespace after maxval
    w, h, maxval = vals
    if maxval > 255:
        raise NotImplementedError("16-bit PNM not supported")
    if b[:2] == b"P6":
        arr = np.frombuffer(b, dtype=np.uint8, count=w * h * 3, offset=pos)
        return arr.reshape(h, w, 3).copy()
    arr = np.frombuffer(b, dtype=np.uint8, count=w * h, offset=pos)
    return np.repeat(arr.reshape(h, w, 1), 3, axis=2)


def _decode_png(b: bytes) -> np.ndarray:
    """PNG (public spec, RFC 2083 / ISO 15948) via stdlib zlib: chunk walk,
    inflate IDAT, per-scanline unfilter (None/Sub/Up/Average/Paeth),
    palette/grayscale/alpha → (h, w, 3) uint8 RGB. 8-bit depth,
    non-interlaced — the overwhelmingly common encoder output; 16-bit and
    Adam7 raise with a clear message."""
    import zlib

    pos = 8
    ihdr = None
    plte = None
    idat = bytearray()
    while pos + 8 <= len(b):
        (length,) = struct.unpack_from(">I", b, pos)
        ctype = b[pos + 4:pos + 8]
        data = b[pos + 8:pos + 8 + length]
        pos += 12 + length  # length + type + data + crc
        if ctype == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", data)
        elif ctype == b"PLTE":
            plte = np.frombuffer(data, dtype=np.uint8).reshape(-1, 3)
        elif ctype == b"IDAT":
            idat += data
        elif ctype == b"IEND":
            break
    if ihdr is None:
        raise ValueError("PNG missing IHDR")
    w, h, depth, ctype_, comp, filt, interlace = ihdr
    if interlace:
        raise NotImplementedError("Adam7-interlaced PNG not supported")
    if depth != 8:
        raise NotImplementedError(f"{depth}-bit PNG not supported (8-bit only)")
    nch = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}.get(ctype_)
    if nch is None:
        raise ValueError(f"bad PNG color type {ctype_}")
    raw = zlib.decompress(bytes(idat))
    stride = w * nch
    if len(raw) < h * (stride + 1):
        raise ValueError("truncated PNG data")
    out = np.zeros((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.int32)
    bpp = nch  # bytes per pixel at depth 8
    for r in range(h):
        off = r * (stride + 1)
        ft = raw[off]
        line = np.frombuffer(raw, dtype=np.uint8, count=stride,
                             offset=off + 1).astype(np.int32)
        if ft == 0:
            rec = line
        elif ft == 1:  # Sub
            rec = line.copy()
            for x in range(bpp, stride):
                rec[x] = (rec[x] + rec[x - bpp]) & 0xFF
        elif ft == 2:  # Up
            rec = (line + prev) & 0xFF
        elif ft == 3:  # Average
            rec = line.copy()
            for x in range(stride):
                left = rec[x - bpp] if x >= bpp else 0
                rec[x] = (rec[x] + ((left + prev[x]) >> 1)) & 0xFF
        elif ft == 4:  # Paeth
            rec = line.copy()
            for x in range(stride):
                a = rec[x - bpp] if x >= bpp else 0
                c = prev[x - bpp] if x >= bpp else 0
                p = a + prev[x] - c
                pa, pb, pc = abs(p - a), abs(p - prev[x]), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (
                    prev[x] if pb <= pc else c)
                rec[x] = (rec[x] + pred) & 0xFF
        else:
            raise ValueError(f"bad PNG filter type {ft}")
        out[r] = rec.astype(np.uint8)
        prev = rec
    px = out.reshape(h, w, nch)
    if ctype_ == 0:
        return np.repeat(px, 3, axis=2)
    if ctype_ == 2:
        return px.copy()
    if ctype_ == 3:
        if plte is None:
            raise ValueError("palette PNG missing PLTE")
        return plte[px[:, :, 0]]
    if ctype_ == 4:
        return np.repeat(px[:, :, :1], 3, axis=2)
    return px[:, :, :3].copy()  # 6: RGBA → RGB


def encode_png(img: np.ndarray) -> bytes:
    """Minimal valid PNG: 8-bit RGB, filter 0 scanlines, one zlib IDAT."""
    import zlib

    h, w = img.shape[:2]
    rgb = np.ascontiguousarray(img[:, :, :3], dtype=np.uint8)
    raw = b"".join(b"\x00" + rgb[r].tobytes() for r in range(h))

    def chunk(ctype: bytes, data: bytes) -> bytes:
        return (struct.pack(">I", len(data)) + ctype + data
                + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF))

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    return (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(raw, 6)) + chunk(b"IEND", b""))


def encode_ppm(img: np.ndarray) -> bytes:
    h, w = img.shape[:2]
    return b"P6\n%d %d\n255\n" % (w, h) + np.ascontiguousarray(
        img[:, :, :3], dtype=np.uint8
    ).tobytes()


def encode_bmp(img: np.ndarray) -> bytes:
    h, w = img.shape[:2]
    stride = (w * 3 + 3) & ~3
    data = bytearray()
    bgr = np.ascontiguousarray(img[:, :, [2, 1, 0]], dtype=np.uint8)
    for r in range(h - 1, -1, -1):
        row = bgr[r].tobytes()
        data += row + b"\x00" * (stride - len(row))
    sz = 54 + len(data)
    hdr = b"BM" + struct.pack("<IHHI", sz, 0, 0, 54)
    hdr += struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(data),
                       2835, 2835, 0, 0)
    return bytes(hdr) + bytes(data)


# ----------------------------------------------------------------- audio

def decode_wav(payload: bytes) -> Tuple[np.ndarray, int]:
    """(mono float64 samples in [-1, 1], sample_rate) from PCM WAV."""
    with wave.open(io.BytesIO(payload), "rb") as wf:
        sr = wf.getframerate()
        n = wf.getnframes()
        ch = wf.getnchannels()
        width = wf.getsampwidth()
        raw = wf.readframes(n)
    if width == 2:
        arr = np.frombuffer(raw, dtype="<i2").astype(np.float64) / 32768.0
    elif width == 1:
        arr = (np.frombuffer(raw, dtype=np.uint8).astype(np.float64) - 128.0) / 128.0
    elif width == 4:
        arr = np.frombuffer(raw, dtype="<i4").astype(np.float64) / 2147483648.0
    else:
        raise NotImplementedError(f"{width * 8}-bit WAV not supported")
    if ch > 1:
        arr = arr.reshape(-1, ch).mean(axis=1)
    return arr, sr


def encode_wav(samples: np.ndarray, sample_rate: int) -> bytes:
    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(1)
        wf.setsampwidth(2)
        wf.setframerate(sample_rate)
        wf.writeframes(
            np.clip(samples * 32767.0, -32768, 32767).astype("<i2").tobytes()
        )
    return buf.getvalue()


# ----------------------------------------------------------------- video

RAWV_MAGIC = b"RAWV"


def decode_rawv_frames(payload: bytes, n_sample: int) -> List[np.ndarray]:
    """Evenly-sampled frames from the RAWV container."""
    if payload[:4] != RAWV_MAGIC:
        raise NotImplementedError(
            "only the RAWV raw-frame container decodes natively; compressed "
            "video needs a codec library (pass decode_fn=...)"
        )
    w, h, nf = struct.unpack_from("<HHH", payload, 4)
    frame_bytes = w * h * 3
    idxs = np.unique(np.linspace(0, nf - 1, min(n_sample, nf)).astype(int))
    out = []
    for i in idxs:
        off = 10 + int(i) * frame_bytes
        out.append(
            np.frombuffer(payload, dtype=np.uint8, count=frame_bytes,
                          offset=off).reshape(h, w, 3).copy()
        )
    return out


def encode_rawv(frames: List[np.ndarray]) -> bytes:
    h, w = frames[0].shape[:2]
    out = bytearray(RAWV_MAGIC + struct.pack("<HHH", w, h, len(frames)))
    for f in frames:
        out += np.ascontiguousarray(f[:, :, :3], dtype=np.uint8).tobytes()
    return bytes(out)
