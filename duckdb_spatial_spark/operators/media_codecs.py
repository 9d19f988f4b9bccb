"""Pure-python/numpy media codecs for the multimodal tier.

The container ships no image/audio libraries, but several public formats
are trivially decodable with numpy + the stdlib, which makes the decode
core of the multimodal operators REAL (not stubbed) for uncompressed
payloads:

* **BMP** (BITMAPINFOHEADER, 24/32-bit uncompressed) — spec is public.
* **PPM/PGM** (netpbm P6/P5 binary) — the classic interchange format.
* **PNG** (all bit depths 1-16, Adam7 interlace, gray/RGB/palette/alpha)
  — stdlib zlib inflate + per-scanline unfilter.
* **JPEG** (8-bit Huffman; 4:4:4/4:2:0/4:2:2 sampling, restart markers)
  — full ITU T.81 decode in numpy: baseline sequential (SOF0/1) AND
  progressive (SOF2: spectral selection + successive approximation,
  annex G).
* **GIF** (87a/89a) — full LZW decode (interlace, transparency) + a
  single-frame encoder.
* **WAV** (PCM) — stdlib ``wave`` module.
* **RAWV** — a minimal raw-video container for frame plumbing:
  ``b'RAWV' + u16 w + u16 h + u16 nframes`` then nframes × w·h·3 RGB bytes.
* **MP4/MOV** — ISO-BMFF box-tree metadata probe (duration, track codecs,
  dims, rates) without touching sample data, plus a skeleton writer.

Formats needing real codec libraries (MP3 frames, arithmetic-coded JPEG,
H.264 sample decode…) still raise NotImplementedError with a clear message.
"""

from __future__ import annotations

import io
import math
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
        return _decode_jpeg(payload)
    if payload[:8] == b"\x89PNG\r\n\x1a\n":
        return _decode_png(payload)
    if payload[:6] in (b"GIF87a", b"GIF89a"):
        return _decode_gif(payload)
    raise ValueError(
        "unrecognized image payload (native: BMP, PPM, PGM, PNG, JPEG, GIF)")


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


def _unfilter_png(raw: bytes, off: int, h: int, stride: int,
                  bpp: int) -> Tuple[np.ndarray, int]:
    """Reconstruct one (sub)image's scanlines: returns ((h, stride) uint8,
    bytes consumed). Filters per RFC 2083 §6: None/Sub/Up/Average/Paeth."""
    out = np.zeros((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.int32)
    for r in range(h):
        at = off + r * (stride + 1)
        ft = raw[at]
        line = np.frombuffer(raw, dtype=np.uint8, count=stride,
                             offset=at + 1).astype(np.int32)
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
    return out, h * (stride + 1)


def _png_samples(rows: np.ndarray, w: int, nch: int, depth: int) -> np.ndarray:
    """(h, stride) filtered bytes → (h, w, nch) uint8 samples (16-bit takes
    the high byte; 1/2/4-bit gray scale to full range, palette keeps the
    index)."""
    h = rows.shape[0]
    if depth == 8:
        return rows.reshape(h, -1)[:, :w * nch].reshape(h, w, nch)
    if depth == 16:
        return rows.reshape(h, -1, 2)[:, :w * nch, 0].reshape(h, w, nch)
    # depths 1/2/4: nch == 1 (gray or palette per spec)
    per = 8 // depth
    mask = (1 << depth) - 1
    shifts = np.array([8 - depth * (i + 1) for i in range(per)])
    expanded = (rows[:, :, None].astype(np.uint16) >> shifts[None, None, :]) & mask
    return expanded.reshape(h, -1)[:, :w].reshape(h, w, 1).astype(np.uint8)


# Adam7 pass grid: (x0, y0, dx, dy) per RFC 2083 §2.6
_ADAM7 = [(0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
          (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2)]


def _decode_png(b: bytes) -> np.ndarray:
    """PNG (public spec, RFC 2083 / ISO 15948) via stdlib zlib: chunk walk,
    inflate IDAT, per-scanline unfilter (None/Sub/Up/Average/Paeth),
    palette/grayscale/alpha → (h, w, 3) uint8 RGB. Bit depths 1/2/4/8/16
    and Adam7 interlace supported (16-bit renders the high byte)."""
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
    nch = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}.get(ctype_)
    if nch is None:
        raise ValueError(f"bad PNG color type {ctype_}")
    if depth not in (1, 2, 4, 8, 16) or (depth < 8 and ctype_ not in (0, 3)):
        raise ValueError(f"bad PNG depth {depth} for color type {ctype_}")
    raw = zlib.decompress(bytes(idat))
    bpp = max(1, nch * depth // 8)

    def stride_of(width):
        return (width * nch * depth + 7) // 8

    if interlace == 0:
        rows, _ = _unfilter_png(raw, 0, h, stride_of(w), bpp)
        px = _png_samples(rows, w, nch, depth)
    elif interlace == 1:
        px = np.zeros((h, w, nch), dtype=np.uint8)
        off = 0
        for (x0, y0, dx, dy) in _ADAM7:
            pw = (w - x0 + dx - 1) // dx
            ph = (h - y0 + dy - 1) // dy
            if pw <= 0 or ph <= 0:
                continue
            rows, used = _unfilter_png(raw, off, ph, stride_of(pw), bpp)
            off += used
            sub = _png_samples(rows, pw, nch, depth)
            px[y0::dy, x0::dx] = sub
    else:
        raise ValueError(f"bad PNG interlace {interlace}")
    if depth < 8 and ctype_ == 0:     # scale 1/2/4-bit gray to full range
        px = (px.astype(np.uint16) * 255 // ((1 << depth) - 1)).astype(np.uint8)
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


# ------------------------------------------------------------------ JPEG

_ZIGZAG = np.array([
     0,  1,  8, 16,  9,  2,  3, 10, 17, 24, 32, 25, 18, 11,  4,  5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13,  6,  7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
], dtype=np.int32)

# orthonormal DCT-II basis: IDCT(F) = C.T @ F @ C  (ITU T.81 A.3.3)
_DCT_C = np.array([
    [math.sqrt(1.0 / 8.0) if u == 0 else
     math.sqrt(2.0 / 8.0) * math.cos((2 * x + 1) * u * math.pi / 16.0)
     for x in range(8)] for u in range(8)
], dtype=np.float64)


class _BitReader:
    """MSB-first bit reader over the entropy-coded segment with 0xFF00
    byte-unstuffing and RSTn marker handling (T.81 F.1.2.3)."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.acc = 0
        self.nbits = 0

    def _fill(self):
        d = self.data
        b = d[self.pos]
        self.pos += 1
        if b == 0xFF:
            nxt = d[self.pos]
            if nxt == 0x00:
                self.pos += 1
            elif 0xD0 <= nxt <= 0xD7:      # RSTn inside fill — caller resyncs
                raise _RestartMarker()
            else:                           # EOI or segment end: pad with 1s
                self.pos -= 1
                b = 0xFF
                self.acc = (self.acc << 8) | b
                self.nbits += 8
                return
        self.acc = (self.acc << 8) | b
        self.nbits += 8

    def bit(self) -> int:
        if self.nbits == 0:
            self._fill()
        self.nbits -= 1
        return (self.acc >> self.nbits) & 1

    def bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.bit()
        return v

    def align_restart(self):
        """Skip to just past the next RSTn marker and clear the register."""
        d = self.data
        p = self.pos
        while not (d[p] == 0xFF and 0xD0 <= d[p + 1] <= 0xD7):
            p += 1
        self.pos = p + 2
        self.acc = 0
        self.nbits = 0


class _RestartMarker(Exception):
    pass


def _build_huffman(counts: List[int], symbols: bytes) -> dict:
    """code (as (length, value)) → symbol, per T.81 C.2."""
    table = {}
    code = 0
    k = 0
    for ln in range(1, 17):
        for _ in range(counts[ln - 1]):
            table[(ln, code)] = symbols[k]
            k += 1
            code += 1
        code <<= 1
    return table


def _huff_decode(br: _BitReader, table: dict) -> int:
    code = 0
    for ln in range(1, 17):
        code = (code << 1) | br.bit()
        sym = table.get((ln, code))
        if sym is not None:
            return sym
    raise ValueError("invalid JPEG huffman code")


def _extend(v: int, t: int) -> int:
    # T.81 F.2.2.1: receive/extend — low t bits as signed magnitude
    return v - (1 << t) + 1 if t and v < (1 << (t - 1)) else v


def _decode_jpeg(b: bytes) -> np.ndarray:
    """DCT JPEG decode (ITU T.81): baseline sequential (SOF0/1) AND
    progressive (SOF2, spectral selection + successive approximation,
    annex G) — marker walk, per-scan Huffman decode into a coefficient
    store, dequantize, inverse zigzag, 8×8 IDCT, chroma upsampling,
    YCbCr→RGB. Arithmetic coding, hierarchical and 12-bit raise."""
    pos = 2  # past SOI
    qt: dict = {}
    huff_dc: dict = {}
    huff_ac: dict = {}
    frame = None
    progressive = False
    restart_interval = 0
    comps = []
    byid: dict = {}
    while pos + 1 < len(b):
        if b[pos] != 0xFF:
            raise ValueError("bad JPEG marker stream")
        marker = b[pos + 1]
        pos += 2
        if marker == 0xD9:          # EOI
            break
        if marker == 0x01 or 0xD0 <= marker <= 0xD7:
            continue                # standalone markers
        (seglen,) = struct.unpack_from(">H", b, pos)
        seg = b[pos + 2:pos + seglen]
        if marker == 0xDB:          # DQT
            sp = 0
            while sp < len(seg):
                pq, tq = seg[sp] >> 4, seg[sp] & 0xF
                sp += 1
                if pq:
                    tbl = np.frombuffer(seg, dtype=">u2", count=64, offset=sp)
                    sp += 128
                else:
                    tbl = np.frombuffer(seg, dtype=np.uint8, count=64, offset=sp)
                    sp += 64
                qt[tq] = tbl.astype(np.float64)
        elif marker in (0xC0, 0xC1, 0xC2):   # SOF0/1 sequential, SOF2 prog
            progressive = marker == 0xC2
            prec = seg[0]
            h = struct.unpack_from(">H", seg, 1)[0]
            w = struct.unpack_from(">H", seg, 3)[0]
            nc = seg[5]
            if prec != 8:
                raise NotImplementedError("only 8-bit JPEG supported")
            comps = []
            for i in range(nc):
                cid, hv, tq = seg[6 + 3 * i], seg[7 + 3 * i], seg[8 + 3 * i]
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 0xF,
                              "tq": tq})
            frame = {"w": w, "h": h}
            hmax = max(c["h"] for c in comps)
            vmax = max(c["v"] for c in comps)
            mcux = (w + 8 * hmax - 1) // (8 * hmax)
            mcuy = (h + 8 * vmax - 1) // (8 * vmax)
            frame.update(hmax=hmax, vmax=vmax, mcux=mcux, mcuy=mcuy)
            for c in comps:
                # full interleaved grid; non-interleaved scans use the
                # tight grid (bw, bh) below
                c["coef"] = np.zeros((mcuy * c["v"], mcux * c["h"], 64),
                                     dtype=np.int32)
                cw = (w * c["h"] + hmax - 1) // hmax
                ch = (h * c["v"] + vmax - 1) // vmax
                c["bw"] = (cw + 7) // 8
                c["bh"] = (ch + 7) // 8
                c["pred"] = 0
                c["eobrun"] = 0
            byid = {c["id"]: c for c in comps}
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                        0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                "only baseline/progressive Huffman JPEG supported — "
                "arithmetic/hierarchical/lossless raise")
        elif marker == 0xC4:        # DHT
            sp = 0
            while sp < len(seg):
                tc, th = seg[sp] >> 4, seg[sp] & 0xF
                counts = list(seg[sp + 1:sp + 17])
                n = sum(counts)
                syms = seg[sp + 17:sp + 17 + n]
                (huff_ac if tc else huff_dc)[th] = _build_huffman(counts, syms)
                sp += 17 + n
        elif marker == 0xDD:        # DRI
            restart_interval = struct.unpack_from(">H", seg, 0)[0]
        elif marker == 0xDA:        # SOS
            if frame is None:
                raise ValueError("JPEG SOS before SOF")
            ns = seg[0]
            scomp = []
            for i in range(ns):
                cs, tdta = seg[1 + 2 * i], seg[2 + 2 * i]
                scomp.append((byid[cs], tdta >> 4, tdta & 0xF))
            ss, se = seg[1 + 2 * ns], seg[2 + 2 * ns]
            ahal = seg[3 + 2 * ns]
            ah, al = ahal >> 4, ahal & 0xF
            if not progressive:
                ss, se, ah, al = 0, 63, 0, 0
            pos = _decode_scan(b, pos + seglen, frame, scomp, ss, se, ah,
                               al, huff_dc, huff_ac, restart_interval)
            continue
        pos += seglen
    if frame is None:
        raise ValueError("JPEG missing SOF")

    w, h = frame["w"], frame["h"]
    planes = []
    for c in comps:
        q = qt[c["tq"]]
        by, bx = c["coef"].shape[:2]
        plane = np.zeros((by * 8, bx * 8))
        for yy in range(by):
            for xx in range(bx):
                blk = np.zeros(64)
                blk[_ZIGZAG] = c["coef"][yy, xx] * q
                plane[yy * 8:yy * 8 + 8, xx * 8:xx * 8 + 8] = (
                    _DCT_C.T @ blk.reshape(8, 8) @ _DCT_C)
        ry = frame["vmax"] // c["v"]
        rx = frame["hmax"] // c["h"]
        if ry > 1 or rx > 1:
            plane = np.repeat(np.repeat(plane, ry, axis=0), rx, axis=1)
        planes.append(plane[:h, :w])
    if len(planes) == 1:
        g = np.clip(np.round(planes[0] + 128.0), 0, 255).astype(np.uint8)
        return np.repeat(g[:, :, None], 3, axis=2)
    y, cb, cr = planes[0] + 128.0, planes[1], planes[2]
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    bl = y + 1.772 * cb
    return np.clip(np.round(np.dstack([r, g, bl])), 0, 255).astype(np.uint8)


def _decode_scan(b, pos, frame, scomp, ss, se, ah, al, huff_dc, huff_ac,
                 restart_interval):
    """Decode one scan's entropy data into the components' coefficient
    stores; returns the stream position after the scan."""
    br = _BitReader(b, pos)
    for c, _, _ in scomp:
        c["pred"] = 0
        c["eobrun"] = 0

    def unit(c, yy, xx, tdc, tac):
        coef = c["coef"][yy, xx]
        if ss == 0 and se == 63 and ah == 0 and al == 0:
            _block_full(br, huff_dc[tdc], huff_ac[tac], c, coef)
        elif ss == 0 and se == 0:
            if ah == 0:   # DC first
                t = _huff_decode(br, huff_dc[tdc])
                diff = _extend(br.bits(t), t) if t else 0
                c["pred"] += diff
                coef[0] = c["pred"] << al
            else:         # DC refinement
                if br.bit():
                    coef[0] |= 1 << al
        elif ah == 0:     # AC first
            _ac_first(br, huff_ac[tac], c, coef, ss, se, al)
        else:             # AC refinement
            _ac_refine(br, huff_ac[tac], c, coef, ss, se, al)

    units = []
    if len(scomp) > 1:    # interleaved (DC/full scans)
        for my in range(frame["mcuy"]):
            for mx in range(frame["mcux"]):
                mcu = []
                for c, tdc, tac in scomp:
                    for by in range(c["v"]):
                        for bx in range(c["h"]):
                            mcu.append((c, my * c["v"] + by,
                                        mx * c["h"] + bx, tdc, tac))
                units.append(mcu)
    else:
        c, tdc, tac = scomp[0]
        for yy in range(c["bh"]):
            for xx in range(c["bw"]):
                units.append([(c, yy, xx, tdc, tac)])

    count = 0
    for mcu in units:
        if restart_interval and count and count % restart_interval == 0:
            br.align_restart()
            for c, _, _ in scomp:
                c["pred"] = 0
                c["eobrun"] = 0
        count += 1
        for (c, yy, xx, tdc, tac) in mcu:
            try:
                unit(c, yy, xx, tdc, tac)
            except _RestartMarker:
                br.align_restart()
                for cc, _, _ in scomp:
                    cc["pred"] = 0
                    cc["eobrun"] = 0
                unit(c, yy, xx, tdc, tac)
    # resync to the next marker (skip any partial byte + pad/fill bytes)
    p = br.pos
    while p + 1 < len(b) and not (b[p] == 0xFF and b[p + 1] != 0x00
                                  and not 0xD0 <= b[p + 1] <= 0xD7):
        p += 1
    return p


def _block_full(br, hdc, hac, c, coef):
    """Sequential full-band block (T.81 F.2.2)."""
    t = _huff_decode(br, hdc)
    diff = _extend(br.bits(t), t) if t else 0
    c["pred"] += diff
    coef[0] = c["pred"]
    k = 1
    while k < 64:
        rs = _huff_decode(br, hac)
        r, sz = rs >> 4, rs & 0xF
        if sz == 0:
            if r == 15:
                k += 16        # ZRL
                continue
            break              # EOB
        k += r
        coef[k] = _extend(br.bits(sz), sz)
        k += 1


def _ac_first(br, hac, c, coef, ss, se, al):
    """Progressive AC first scan (T.81 G.1.2.2)."""
    if c["eobrun"] > 0:
        c["eobrun"] -= 1
        return
    k = ss
    while k <= se:
        rs = _huff_decode(br, hac)
        r, sz = rs >> 4, rs & 0xF
        if sz == 0:
            if r == 15:
                k += 16
                continue
            c["eobrun"] = (1 << r) - 1
            if r:
                c["eobrun"] += br.bits(r)
            break
        k += r
        coef[k] = _extend(br.bits(sz), sz) << al
        k += 1


def _ac_refine(br, hac, c, coef, ss, se, al):
    """Progressive AC refinement scan (T.81 G.1.2.3): correction bits for
    already-nonzero coefficients, ±1<<al insertions for new ones."""
    p1 = 1 << al
    m1 = -1 << al
    k = ss
    if c["eobrun"] == 0:
        while k <= se:
            rs = _huff_decode(br, hac)
            r, sz = rs >> 4, rs & 0xF
            if sz == 0:
                if r != 15:
                    c["eobrun"] = (1 << r)
                    if r:
                        c["eobrun"] += br.bits(r)
                    break
                # r == 15: pass over 16 zero-history coefficients
                newval = 0
            else:
                # size must be 1; the received bit gives the sign
                newval = p1 if br.bit() else m1
            while k <= se:
                if coef[k] != 0:
                    if br.bit() and (coef[k] & p1) == 0:
                        coef[k] += p1 if coef[k] > 0 else m1
                else:
                    if r == 0:
                        if sz:
                            coef[k] = newval
                        k += 1
                        break
                    r -= 1
                k += 1
    if c["eobrun"] > 0:
        # within an EOB run only correction bits for nonzero coefs appear
        while k <= se:
            if coef[k] != 0 and br.bit() and (coef[k] & p1) == 0:
                coef[k] += p1 if coef[k] > 0 else m1
            k += 1
        c["eobrun"] -= 1


def encode_jpeg(img: np.ndarray, quant: int = 1,
                subsample: str = "444") -> bytes:
    """Minimal baseline JPEG encoder (tests + sink): 4:4:4 or 4:2:0, one
    uniform quantization value (quant=1 ≈ near-lossless at 4:4:4), simple
    Huffman tables built from the actual symbol distribution."""
    h, w = img.shape[:2]
    rgb = img[:, :, :3].astype(np.float64)
    y = (0.299 * rgb[:, :, 0] + 0.587 * rgb[:, :, 1]
         + 0.114 * rgb[:, :, 2]) - 128.0
    cb = (rgb[:, :, 2] - (y + 128.0)) / 1.772
    cr = (rgb[:, :, 0] - (y + 128.0)) / 1.402
    if subsample == "420":
        samp = [(2, 2), (1, 1), (1, 1)]
    elif subsample == "444":
        samp = [(1, 1), (1, 1), (1, 1)]
    else:
        raise ValueError("subsample must be '444' or '420'")
    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)
    planes = []
    for (sh, sv), p in zip(samp, (y, cb, cr)):
        if sh < hmax or sv < vmax:
            # box-filter downsample after padding to even dims
            pe = np.pad(p, ((0, p.shape[0] % 2), (0, p.shape[1] % 2)),
                        mode="edge")
            p = 0.25 * (pe[0::2, 0::2] + pe[1::2, 0::2]
                        + pe[0::2, 1::2] + pe[1::2, 1::2])
        tw, th = mcux * sh * 8, mcuy * sv * 8
        planes.append(np.pad(p, ((0, th - p.shape[0]), (0, tw - p.shape[1])),
                             mode="edge"))
    qtbl = np.full(64, quant, dtype=np.float64)

    # forward pass in MCU interleave order: gather (comp, zigzag) blocks
    blocks = []
    for my in range(mcuy):
        for mx in range(mcux):
            for ci, (sh, sv) in enumerate(samp):
                for by in range(sv):
                    for bx in range(sh):
                        r0 = (my * sv + by) * 8
                        c0 = (mx * sh + bx) * 8
                        f = _DCT_C @ planes[ci][r0:r0 + 8,
                                                c0:c0 + 8] @ _DCT_C.T
                        # stream coefficient k is f.flat[_ZIGZAG[k]]
                        zz = np.round(
                            f.reshape(64)[_ZIGZAG] / qtbl).astype(int)
                        blocks.append((ci, zz))

    def cat(v):
        return 0 if v == 0 else int(v).bit_length() if v > 0 else int(-v).bit_length()

    dc_syms = [[], [], []]
    ac_syms = [[], [], []]
    events = []
    pred = [0, 0, 0]
    for ci, zz in blocks:
        diff = int(zz[0]) - pred[ci]
        pred[ci] = int(zz[0])
        t = cat(diff)
        dc_syms[ci].append(t)
        ev = [("dc", ci, t, diff)]
        run = 0
        last = 63
        while last > 0 and zz[last] == 0:
            last -= 1
        k = 1
        while k <= last:
            v = int(zz[k])
            if v == 0:
                run += 1
                k += 1
                continue
            while run > 15:
                ac_syms[ci].append(0xF0)
                ev.append(("ac", ci, 0xF0, 0))
                run -= 16
            s = cat(v)
            sym = (run << 4) | s
            ac_syms[ci].append(sym)
            ev.append(("ac", ci, sym, v))
            run = 0
            k += 1
        if last < 63:
            ac_syms[ci].append(0x00)
            ev.append(("ac", ci, 0x00, 0))
        events.append(ev)

    # canonical huffman from symbol frequencies (shared tables: 0 = luma,
    # 1 = chroma), lengths capped by using frequency-sorted 8-bit codes —
    # simplest valid assignment: give every distinct symbol a code of the
    # same length L = ceil(log2(n+1)) (+1 to keep the all-ones code free,
    # T.81 C.2 forbids it)
    def build(symlists):
        seen = sorted({s for sl in symlists for s in sl})
        L = max(1, (len(seen) + 1 - 1).bit_length())
        if len(seen) + 1 > (1 << L):
            L += 1
        counts = [0] * 16
        counts[L - 1] = len(seen)
        enc = {}
        code = 0
        for ln in range(1, 17):
            if ln == L:
                for s in seen:
                    enc[s] = (ln, code)
                    code += 1
            code <<= 1
        return counts, bytes(seen), enc

    dcl_counts, dcl_syms, dcl = build([dc_syms[0]])
    dcc_counts, dcc_syms, dcc = build(dc_syms[1:])
    acl_counts, acl_syms, acl = build([ac_syms[0]])
    acc_counts, acc_syms, acc = build(ac_syms[1:])
    enc_dc = [dcl, dcc, dcc]
    enc_ac = [acl, acc, acc]

    out = bytearray(b"\xff\xd8")

    def seg(marker, payload):
        out.extend(bytes([0xFF, marker]))
        out.extend(struct.pack(">H", len(payload) + 2))
        out.extend(payload)

    seg(0xDB, bytes([0x00]) + bytes(np.full(64, quant, dtype=np.uint8)))
    seg(0xC0, bytes([8]) + struct.pack(">HH", h, w) + bytes([3])
        + bytes([1, (samp[0][0] << 4) | samp[0][1], 0,
                 2, (samp[1][0] << 4) | samp[1][1], 0,
                 3, (samp[2][0] << 4) | samp[2][1], 0]))
    seg(0xC4, bytes([0x00]) + bytes(dcl_counts) + dcl_syms)
    seg(0xC4, bytes([0x01]) + bytes(dcc_counts) + dcc_syms)
    seg(0xC4, bytes([0x10]) + bytes(acl_counts) + acl_syms)
    seg(0xC4, bytes([0x11]) + bytes(acc_counts) + acc_syms)
    seg(0xDA, bytes([3, 1, 0x00, 2, 0x11, 3, 0x11, 0, 63, 0]))

    acc_bits = []

    def put(ln, code):
        for i in range(ln - 1, -1, -1):
            acc_bits.append((code >> i) & 1)

    for ev in events:
        for kind, ci, sym, v in ev:
            ln, code = (enc_dc[ci] if kind == "dc" else enc_ac[ci])[sym]
            put(ln, code)
            s = sym & 0xF if kind == "ac" else sym
            if kind == "dc":
                s = sym
            if s:
                vv = v if v > 0 else v + (1 << s) - 1
                put(s, vv)
    while len(acc_bits) % 8:
        acc_bits.append(1)
    data = bytearray()
    for i in range(0, len(acc_bits), 8):
        byte = 0
        for bit in acc_bits[i:i + 8]:
            byte = (byte << 1) | bit
        data.append(byte)
        if byte == 0xFF:
            data.append(0x00)
    out.extend(data)
    out.extend(b"\xff\xd9")
    return bytes(out)


# ---------------------------------------------------------------------------
# GIF (GIF87a/GIF89a, public spec): LZW-compressed indexed color.


def _decode_gif(b: bytes) -> np.ndarray:
    """First frame of a GIF → (h, w, 3) uint8 RGB. Full LZW decoder;
    handles local/global color tables, interlacing, and transparency
    (transparent pixels resolve to the background color)."""
    if b[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("gif: bad signature")
    W, H = struct.unpack_from("<HH", b, 6)
    packed = b[10]
    bg = b[11]
    pos = 13
    gct = None
    if packed & 0x80:
        n = 2 << (packed & 0x07)
        gct = np.frombuffer(b, np.uint8, n * 3, pos).reshape(n, 3)
        pos += n * 3
    transparent = None
    while pos < len(b):
        block = b[pos]
        if block == 0x21:  # extension
            label = b[pos + 1]
            pos += 2
            if label == 0xF9:  # graphic control
                sz = b[pos]
                flags = b[pos + 1]
                if flags & 1:
                    transparent = b[pos + 4]
                pos += sz + 1
            while b[pos] != 0:  # skip sub-blocks
                pos += b[pos] + 1
            pos += 1
        elif block == 0x2C:  # image descriptor
            x0, y0, w, h = struct.unpack_from("<HHHH", b, pos + 1)
            ipacked = b[pos + 9]
            pos += 10
            ct = gct
            if ipacked & 0x80:
                n = 2 << (ipacked & 0x07)
                ct = np.frombuffer(b, np.uint8, n * 3, pos).reshape(n, 3)
                pos += n * 3
            min_code = b[pos]
            pos += 1
            data = bytearray()
            while b[pos] != 0:
                ln = b[pos]
                data += b[pos + 1:pos + 1 + ln]
                pos += ln + 1
            pos += 1
            idx = _lzw_decode(bytes(data), min_code, w * h)
            if ipacked & 0x40:  # interlaced row order
                rows = np.zeros(h, dtype=np.int64)
                order = []
                for start, step in ((0, 8), (4, 8), (2, 4), (1, 2)):
                    order.extend(range(start, h, step))
                rows[np.asarray(order, dtype=np.int64)] = np.arange(h)
                idx = idx.reshape(h, w)[rows]
            else:
                idx = idx.reshape(h, w)
            if ct is None:
                raise ValueError("gif: no color table")
            out = ct[np.clip(idx, 0, len(ct) - 1)]
            if transparent is not None:
                mask = idx == transparent
                bgc = ct[bg] if gct is not None and bg < len(ct) else np.zeros(3, np.uint8)
                out[mask] = bgc
            full = np.zeros((H, W, 3), dtype=np.uint8)
            full[y0:y0 + h, x0:x0 + w] = out
            return full
        elif block == 0x3B:  # trailer
            break
        else:
            raise ValueError(f"gif: unknown block 0x{block:02x}")
    raise ValueError("gif: no image data")


def _lzw_decode(data: bytes, min_code: int, npix: int) -> np.ndarray:
    clear = 1 << min_code
    end = clear + 1
    out = np.empty(npix, dtype=np.uint16)
    nout = 0
    # bit reader (LSB-first per GIF spec)
    acc = 0
    nbits = 0
    di = 0
    table: List[bytes] = [bytes([i]) for i in range(clear)] + [b"", b""]
    width = min_code + 1
    prev = None
    while nout < npix and di <= len(data):
        while nbits < width and di < len(data):
            acc |= data[di] << nbits
            nbits += 8
            di += 1
        if nbits < width:
            break
        code = acc & ((1 << width) - 1)
        acc >>= width
        nbits -= width
        if code == clear:
            table = [bytes([i]) for i in range(clear)] + [b"", b""]
            width = min_code + 1
            prev = None
            continue
        if code == end:
            break
        if prev is None:
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            table.append(prev + entry[:1])
        else:
            entry = prev + prev[:1]
            table.append(entry)
        if prev is not None and len(table) >= (1 << width) and width < 12:
            width += 1
        take = min(len(entry), npix - nout)
        out[nout:nout + take] = np.frombuffer(entry[:take], np.uint8)
        nout += take
        prev = entry
    if nout < npix:
        out[nout:] = 0
    return out.astype(np.int64)


def encode_gif(img: np.ndarray) -> bytes:
    """Single-frame GIF89a from an (h, w, 3) uint8 image. Palette built
    from the image's distinct colors (≤256 required); LZW-encoded."""
    h, w = img.shape[:2]
    flat = img.reshape(-1, 3)
    colors, idx = np.unique(flat, axis=0, return_inverse=True)
    if len(colors) > 256:
        raise ValueError("encode_gif: more than 256 distinct colors")
    depth = max(1, int(np.ceil(np.log2(max(2, len(colors))))))
    n_ct = 1 << depth
    ct = np.zeros((n_ct, 3), dtype=np.uint8)
    ct[:len(colors)] = colors
    out = bytearray(b"GIF89a")
    out += struct.pack("<HH", w, h)
    out += bytes([0x80 | (depth - 1), 0, 0])
    out += ct.tobytes()
    out += b"\x2c" + struct.pack("<HHHH", 0, 0, w, h) + b"\x00"
    min_code = max(2, depth)
    out.append(min_code)
    out += _gif_lzw_encode(idx.astype(np.int64), min_code)
    out += b"\x00\x3b"
    return bytes(out)


def _gif_lzw_encode(idx: np.ndarray, min_code: int) -> bytes:
    clear = 1 << min_code
    end = clear + 1
    table = {bytes([i]): i for i in range(clear)}
    next_code = end + 1
    width = min_code + 1
    bits = bytearray()
    acc = 0
    nbits = 0
    chunks = bytearray()

    def put(code):
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            chunks.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    put(clear)
    prev = b""
    for v in idx:
        nxt = prev + bytes([int(v)])
        if nxt in table:
            prev = nxt
            continue
        put(table[prev])
        table[nxt] = next_code
        next_code += 1
        if next_code > (1 << width) and width < 12:
            width += 1
        if next_code >= 4096:
            put(clear)
            table = {bytes([i]): i for i in range(clear)}
            next_code = end + 1
            width = min_code + 1
        prev = bytes([int(v)])
    if prev:
        put(table[prev])
    put(end)
    if nbits:
        chunks.append(acc & 0xFF)
    out = bytearray()
    for i in range(0, len(chunks), 255):
        blk = chunks[i:i + 255]
        out.append(len(blk))
        out += blk
    return bytes(out)


# ---------------------------------------------------------------------------
# ISO BMFF (MP4/MOV) metadata probe — box walk, no codec decode.


def probe_mp4(b: bytes) -> dict:
    """Parse the ISO base-media box tree (public ISO/IEC 14496-12 layout):
    returns {"brand", "duration_ms", "tracks": [{"kind", "codec",
    "width", "height", "sample_rate", "n_channels"}]}. Metadata-only —
    the sample data (mdat) is never touched, which is the right shape for
    a 100-TB video manifest scan."""
    info = {"brand": None, "duration_ms": None, "tracks": []}

    def walk(lo: int, hi: int, depth: int = 0):
        pos = lo
        while pos + 8 <= hi:
            size = struct.unpack_from(">I", b, pos)[0]
            typ = b[pos + 4:pos + 8].decode("latin1")
            body = pos + 8
            if size == 1:
                size = struct.unpack_from(">Q", b, pos + 8)[0]
                body = pos + 16
            if size == 0:
                size = hi - pos
            end = pos + size
            if typ == "ftyp":
                info["brand"] = b[body:body + 4].decode("latin1")
            elif typ == "mvhd":
                ver = b[body]
                if ver == 1:
                    scale, dur = struct.unpack_from(">IQ", b, body + 20)
                else:
                    scale, dur = struct.unpack_from(">II", b, body + 12)
                if scale:
                    info["duration_ms"] = int(dur * 1000 / scale)
            elif typ == "trak":
                info["tracks"].append({"kind": None, "codec": None,
                                       "width": None, "height": None,
                                       "sample_rate": None,
                                       "n_channels": None})
                walk(body, end, depth + 1)
            elif typ == "hdlr" and info["tracks"]:
                handler = b[body + 8:body + 12].decode("latin1")
                info["tracks"][-1]["kind"] = {
                    "vide": "video", "soun": "audio"}.get(handler, handler)
            elif typ == "tkhd" and info["tracks"]:
                # v0: 4 ver/flags + 20 times/ids + 16 layer..volume +
                # 36 matrix = 76 bytes before width; v1 times are 64-bit
                ver = b[body]
                off = body + (88 if ver == 1 else 76)
                wfx, hfx = struct.unpack_from(">II", b, off)
                if wfx:
                    info["tracks"][-1]["width"] = wfx >> 16
                    info["tracks"][-1]["height"] = hfx >> 16
            elif typ == "stsd" and info["tracks"]:
                n = struct.unpack_from(">I", b, body + 4)[0]
                if n:
                    fourcc = b[body + 12:body + 16].decode("latin1")
                    tr = info["tracks"][-1]
                    tr["codec"] = fourcc
                    if tr["kind"] == "audio":
                        tr["n_channels"] = struct.unpack_from(
                            ">H", b, body + 32)[0]
                        tr["sample_rate"] = struct.unpack_from(
                            ">I", b, body + 40)[0] >> 16
            elif typ in ("moov", "mdia", "minf", "stbl"):
                walk(body, end, depth + 1)
            pos = end

    walk(0, len(b))
    return info


def encode_bmff_skeleton(duration_ms: int, width: int = 0, height: int = 0,
                         sample_rate: int = 0, n_channels: int = 0,
                         video_codec: str = "avc1",
                         audio_codec: str = "mp4a") -> bytes:
    """Minimal valid ISO-BMFF container (ftyp + moov, empty mdat) carrying
    the given metadata — the writer dual of :func:`probe_mp4` for
    manifest-pipeline tests and fixtures."""
    def box(typ: bytes, payload: bytes) -> bytes:
        return struct.pack(">I", len(payload) + 8) + typ + payload

    ftyp = box(b"ftyp", b"isom" + b"\x00" * 8)
    mvhd = box(b"mvhd", bytes(12) + struct.pack(">II", 1000, duration_ms)
               + bytes(80))
    traks = b""
    if width and height:
        tkhd = box(b"tkhd", bytes(76) + struct.pack(
            ">II", width << 16, height << 16))
        hdlr = box(b"hdlr", bytes(8) + b"vide" + bytes(12))
        stsd = box(b"stsd", bytes(4) + struct.pack(">I", 1)
                   + box(video_codec.encode("latin1"), bytes(70)))
        traks += box(b"trak", tkhd + box(
            b"mdia", hdlr + box(b"minf", box(b"stbl", stsd))))
    if sample_rate:
        hdlr = box(b"hdlr", bytes(8) + b"soun" + bytes(12))
        payload = (bytes(16) + struct.pack(">H", n_channels or 1) + bytes(6)
                   + struct.pack(">I", sample_rate << 16))
        stsd = box(b"stsd", bytes(4) + struct.pack(">I", 1)
                   + box(audio_codec.encode("latin1"), payload))
        traks += box(b"trak", box(
            b"mdia", hdlr + box(b"minf", box(b"stbl", stsd))))
    moov = box(b"moov", mvhd + traks)
    return ftyp + moov + box(b"mdat", b"")


# ---------------------------------------------------------------------------
# IMA ADPCM WAV (format tag 0x0011, public IMA/DVI spec)

_IMA_STEP = np.array([
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31, 34, 37,
    41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143, 157, 173,
    190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494, 544, 598, 658,
    724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552, 1707, 1878, 2066,
    2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428, 4871, 5358, 5894,
    6484, 7132, 7845, 8630, 9493, 10442, 11487, 12635, 13899, 15289,
    16818, 18500, 20350, 22385, 24623, 27086, 29794, 32767], dtype=np.int64)
_IMA_INDEX = np.array([-1, -1, -1, -1, 2, 4, 6, 8], dtype=np.int64)


def _ima_decode_block(data: bytes, n_samples: int) -> np.ndarray:
    """One mono IMA ADPCM block: 4-byte header (predictor int16, index u8,
    reserved u8) then 4-bit codes, low nibble first."""
    pred = struct.unpack_from("<h", data, 0)[0]
    index = min(max(data[2], 0), 88)
    out = np.empty(n_samples, dtype=np.int64)
    out[0] = pred
    codes = np.frombuffer(data, np.uint8, offset=4)
    nibbles = np.empty(len(codes) * 2, dtype=np.uint8)
    nibbles[0::2] = codes & 0x0F
    nibbles[1::2] = codes >> 4
    for i in range(1, n_samples):
        c = int(nibbles[i - 1])
        step = int(_IMA_STEP[index])
        diff = step >> 3
        if c & 1:
            diff += step >> 2
        if c & 2:
            diff += step >> 1
        if c & 4:
            diff += step
        pred = pred - diff if c & 8 else pred + diff
        pred = max(-32768, min(32767, pred))
        index = max(0, min(88, index + int(_IMA_INDEX[c & 7])))
        out[i] = pred
    return out


def decode_wav_any(payload: bytes) -> Tuple[np.ndarray, int]:
    """PCM (stdlib wave) or IMA ADPCM (format tag 0x0011) WAV decode."""
    try:
        return decode_wav(payload)
    except Exception:
        pass
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos = 12
    fmt = None
    data = None
    while pos + 8 <= len(payload):
        cid = payload[pos:pos + 4]
        (sz,) = struct.unpack_from("<I", payload, pos + 4)
        body = payload[pos + 8:pos + 8 + sz]
        if cid == b"fmt ":
            fmt = body
        elif cid == b"data":
            data = body
        pos += 8 + sz + (sz & 1)
    if fmt is None or data is None:
        raise ValueError("RIFF missing fmt/data chunks")
    tag, ch, sr, _br, block_align, _bits = struct.unpack_from("<HHIIHH", fmt, 0)
    if tag != 0x0011:
        raise NotImplementedError(f"WAV format tag 0x{tag:04x}")
    if ch != 1:
        raise NotImplementedError("IMA ADPCM: mono only")
    spb = (block_align - 4) * 2 + 1  # samples per block
    chunks = []
    for off in range(0, len(data) - block_align + 1, block_align):
        chunks.append(_ima_decode_block(data[off:off + block_align], spb))
    samples = (np.concatenate(chunks) if chunks else
               np.zeros(0, dtype=np.int64))
    return samples.astype(np.float64) / 32768.0, sr


def encode_wav_ima(samples: np.ndarray, sample_rate: int,
                   block_align: int = 256) -> bytes:
    """Mono IMA ADPCM WAV encoder (format tag 0x0011) — the test dual of
    :func:`decode_wav_any`."""
    pcm = np.clip(np.asarray(samples, dtype=np.float64) * 32767.0,
                  -32768, 32767).astype(np.int64)
    spb = (block_align - 4) * 2 + 1
    blocks = []
    for off in range(0, len(pcm), spb):
        seg = pcm[off:off + spb]
        if len(seg) < spb:
            seg = np.concatenate([seg, np.zeros(spb - len(seg), np.int64)])
        pred = int(seg[0])
        # seed the block's step index from the observed slope — a cold
        # index (step 7) takes hundreds of samples to adapt to real audio
        d = np.abs(np.diff(seg))
        target = max(1.0, float(d.mean()))
        index = int(np.argmin(np.abs(_IMA_STEP - target)))
        blk = bytearray(struct.pack("<hBB", pred, index, 0))
        nibbles = []
        for s in seg[1:]:
            step = int(_IMA_STEP[index])
            delta = int(s) - pred
            c = 0
            if delta < 0:
                c = 8
                delta = -delta
            diff = step >> 3
            if delta >= step:
                c |= 4
                delta -= step
                diff += step
            if delta >= step >> 1:
                c |= 2
                delta -= step >> 1
                diff += step >> 1
            if delta >= step >> 2:
                c |= 1
                diff += step >> 2
            pred = pred - diff if c & 8 else pred + diff
            pred = max(-32768, min(32767, pred))
            index = max(0, min(88, index + int(_IMA_INDEX[c & 7])))
            nibbles.append(c)
        for i in range(0, len(nibbles), 2):
            lo = nibbles[i]
            hi = nibbles[i + 1] if i + 1 < len(nibbles) else 0
            blk.append(lo | (hi << 4))
        blocks.append(bytes(blk))
    data = b"".join(blocks)
    byte_rate = sample_rate * block_align // spb
    fmt = struct.pack("<HHIIHHH", 0x0011, 1, sample_rate, byte_rate,
                      block_align, 4, spb & 0xFFFF)
    out = b"RIFF" + struct.pack("<I", 4 + 8 + len(fmt) + 8 + len(data)) + b"WAVE"
    out += b"fmt " + struct.pack("<I", len(fmt)) + fmt
    out += b"data" + struct.pack("<I", len(data)) + data
    return out


# ---------------------------------------------------------------------------
# MP3 (MPEG audio) frame-header probe — public ISO 11172-3 header layout.

_MP3_BITRATE_V1L3 = [0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192,
                     224, 256, 320, 0]
_MP3_BITRATE_V2L3 = [0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128,
                     144, 160, 0]
_MP3_RATES = {3: [44100, 48000, 32000], 2: [22050, 24000, 16000],
              0: [11025, 12000, 8000]}


def probe_mp3(payload: bytes) -> dict:
    """Walk MPEG-audio layer-III frame headers (skipping any ID3v2 tag):
    returns {"n_frames", "sample_rate", "duration_ms", "bitrate_kbps"
    (mean), "vbr"}. Header-walk only — no audio decode, the audio dual of
    :func:`probe_mp4`."""
    pos = 0
    if payload[:3] == b"ID3":
        sz = ((payload[6] & 0x7F) << 21 | (payload[7] & 0x7F) << 14
              | (payload[8] & 0x7F) << 7 | (payload[9] & 0x7F))
        pos = 10 + sz
    n = 0
    sr_out = None
    bitrates = []
    while pos + 4 <= len(payload):
        if payload[pos] != 0xFF or (payload[pos + 1] & 0xE0) != 0xE0:
            pos += 1
            continue
        b1, b2 = payload[pos + 1], payload[pos + 2]
        ver = (b1 >> 3) & 0x3        # 3=MPEG1, 2=MPEG2, 0=MPEG2.5
        layer = (b1 >> 1) & 0x3      # 1 = layer III
        if ver == 1 or layer != 1:
            pos += 1
            continue
        br_idx = (b2 >> 4) & 0xF
        sr_idx = (b2 >> 2) & 0x3
        if sr_idx == 3 or br_idx in (0, 15):
            pos += 1
            continue
        table = _MP3_BITRATE_V1L3 if ver == 3 else _MP3_BITRATE_V2L3
        br = table[br_idx] * 1000
        sr = _MP3_RATES[ver][sr_idx]
        pad = (b2 >> 1) & 1
        spf = 1152 if ver == 3 else 576
        flen = spf * br // (8 * sr) + pad
        if flen <= 0:
            pos += 1
            continue
        n += 1
        sr_out = sr
        bitrates.append(br)
        pos += flen
    if n == 0:
        raise ValueError("no MPEG audio frames found")
    spf = 1152 if sr_out >= 32000 else 576
    return {
        "n_frames": n,
        "sample_rate": sr_out,
        "duration_ms": int(round(1000.0 * n * spf / sr_out)),
        "bitrate_kbps": int(round(sum(bitrates) / len(bitrates) / 1000)),
        "vbr": len(set(bitrates)) > 1,
    }
