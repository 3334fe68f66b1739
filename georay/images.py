"""Numpy-native image codecs, PSNR, content hashing, pixel synthesis.

The sandbox has no PIL/libjpeg (SURVEY.md §7 environment facts), so the
image+caption table (BASELINE.json input_hint) uses three self-contained
codecs, all pure numpy + stdlib zlib:

- ``bmp``  — 24-bit BGR bottom-up rows padded to 4 bytes (lossless).
- ``png``  — real PNG: signature/IHDR/IDAT/IEND, zlib, filter type 0
             per row, CRC32-checked (lossless; readable by any PNG tool).
- ``q6``   — 6-bit/channel quantization + zlib (LOSSY; PSNR ≈ 46–49 dB vs
             the source, exercising the PSNR ≥ 40 dB decoded-pixel
             invariant for real, BASELINE.json:15).
- ``jpeg`` — REAL baseline JFIF (georay/jpeg.py: 8×8 DCT, Annex K quant +
             Huffman tables, byte stuffing — a perceptual transform codec,
             VERDICT r4 #7). Lossy; quality 97 → PSNR ≥ 43.5 dB over every
             fixture pattern (measured min across the 768-period).

Pixels are (h, w, 3) uint8 RGB everywhere. Everything is deterministic —
:func:`synth_pixels` regenerates any image's ground truth from its row index
alone (FIXTURES.md F1).
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

FORMATS = ("bmp", "png", "q6", "jpeg")
LOSSY_FORMATS = ("q6", "jpeg")
_ROTATION = ("bmp", "png", "q6")  # base per-row cycle; jpeg overrides 1/16


# ------------------------------------------------------------------------ BMP


def encode_bmp(pixels: np.ndarray) -> bytes:
    h, w, _ = pixels.shape
    row_bytes = w * 3
    pad = (-row_bytes) % 4
    stride = row_bytes + pad
    img_size = stride * h
    header = struct.pack(
        "<2sIHHIIiiHHIIiiII",
        b"BM", 14 + 40 + img_size, 0, 0, 14 + 40,
        40, w, h, 1, 24, 0, img_size, 2835, 2835, 0, 0,
    )
    bgr = pixels[::-1, :, ::-1]  # bottom-up, RGB->BGR
    if pad:
        rows = np.zeros((h, stride), dtype=np.uint8)
        rows[:, :row_bytes] = bgr.reshape(h, row_bytes)
        body = rows.tobytes()
    else:
        body = np.ascontiguousarray(bgr).tobytes()
    return header + body


def decode_bmp(data: bytes) -> np.ndarray:
    if data[:2] != b"BM":
        raise ValueError("not a BMP")
    offset = struct.unpack_from("<I", data, 10)[0]
    w, h = struct.unpack_from("<ii", data, 18)
    bpp = struct.unpack_from("<H", data, 28)[0]
    if bpp != 24:
        raise ValueError(f"unsupported BMP bpp={bpp}")
    stride = (w * 3 + 3) & ~3
    arr = np.frombuffer(data, dtype=np.uint8, count=stride * h, offset=offset)
    arr = arr.reshape(h, stride)[:, : w * 3].reshape(h, w, 3)
    return arr[::-1, :, ::-1].copy()


# ------------------------------------------------------------------------ PNG

_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _chunk(tag: bytes, payload: bytes) -> bytes:
    return (
        struct.pack(">I", len(payload))
        + tag
        + payload
        + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF)
    )


def encode_png(pixels: np.ndarray) -> bytes:
    h, w, _ = pixels.shape
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)  # 8-bit RGB
    raw = np.zeros((h, 1 + w * 3), dtype=np.uint8)
    raw[:, 1:] = pixels.reshape(h, w * 3)  # filter type 0 per row
    idat = zlib.compress(raw.tobytes(), 6)
    return _PNG_SIG + _chunk(b"IHDR", ihdr) + _chunk(b"IDAT", idat) + _chunk(b"IEND", b"")


def decode_png(data: bytes) -> np.ndarray:
    if data[:8] != _PNG_SIG:
        raise ValueError("not a PNG")
    pos, w = 8, None
    idat = b""
    while pos < len(data):
        (length,) = struct.unpack_from(">I", data, pos)
        tag = data[pos + 4 : pos + 8]
        payload = data[pos + 8 : pos + 8 + length]
        if tag == b"IHDR":
            w, h, depth, ctype = struct.unpack_from(">IIBB", payload)
            if depth != 8 or ctype != 2:
                raise ValueError("unsupported PNG variant")
        elif tag == b"IDAT":
            idat += payload
        elif tag == b"IEND":
            break
        pos += 12 + length
    raw = np.frombuffer(zlib.decompress(idat), dtype=np.uint8).reshape(h, 1 + w * 3)
    if (raw[:, 0] != 0).any():
        raise ValueError("unsupported PNG filter (engine encodes filter 0 only)")
    return raw[:, 1:].reshape(h, w, 3).copy()


# ------------------------------------------------------------------- q6 lossy


def encode_q6(pixels: np.ndarray) -> bytes:
    h, w, _ = pixels.shape
    q = (pixels >> 2).astype(np.uint8)  # 6 bits/channel
    return struct.pack("<HH", w, h) + zlib.compress(q.tobytes(), 6)


def decode_q6(data: bytes) -> np.ndarray:
    w, h = struct.unpack_from("<HH", data, 0)
    q = np.frombuffer(zlib.decompress(data[4:]), dtype=np.uint8).reshape(h, w, 3)
    return ((q << 2) | (q >> 4)).astype(np.uint8)  # bit-replicate to 8 bits


from georay.jpeg import decode_jpeg, encode_jpeg  # noqa: E402 (registry)

_ENCODERS = {"bmp": encode_bmp, "png": encode_png, "q6": encode_q6,
             "jpeg": encode_jpeg}
_DECODERS = {"bmp": decode_bmp, "png": decode_png, "q6": decode_q6,
             "jpeg": decode_jpeg}


def encode_image(pixels: np.ndarray, fmt: str) -> bytes:
    return _ENCODERS[fmt](pixels)


def decode_image(data: bytes, fmt: str) -> np.ndarray:
    return _DECODERS[fmt](data)


# --------------------------------------------------------------------- metrics


def psnr(a: np.ndarray, b: np.ndarray) -> float:
    """Peak signal-to-noise ratio in dB; inf for identical images."""
    diff = a.astype(np.float64) - b.astype(np.float64)
    mse = np.mean(diff * diff)
    if mse == 0:
        return float("inf")
    return 10.0 * np.log10(255.0 * 255.0 / mse)


_FNV_OFFSET = np.uint64(0xCBF29CE484222325)
_POLY_P = np.uint64(0x100000001B3)  # FNV prime reused as polynomial base


_POW_CACHE: dict[int, np.ndarray] = {}


def _powers(n: int) -> np.ndarray:
    cached = _POW_CACHE.get(n)
    if cached is None:
        with np.errstate(over="ignore"):
            p = np.empty(n, dtype=np.uint64)
            acc = np.uint64(1)
            for i in range(n):
                p[i] = acc
                acc = acc * _POLY_P  # intentional mod-2^64 wraparound
        _POW_CACHE[n] = p
        cached = p
    return cached


def content_hash64(data: bytes | np.ndarray) -> int:
    """Vectorized 64-bit content hash (polynomial over uint64 words, FNV
    constants, cached powers table). Deterministic and collision-exact for
    identical pixel tensors — the ``phash`` dedup key of FIXTURES.md F1."""
    buf = np.frombuffer(
        data.tobytes() if isinstance(data, np.ndarray) else data, dtype=np.uint8
    )
    pad = (-buf.size) % 8
    if pad:
        buf = np.concatenate([buf, np.zeros(pad, dtype=np.uint8)])
    words = buf.view(np.uint64)
    p = _powers(words.size + 1)
    with np.errstate(over="ignore"):  # intentional mod-2^64 arithmetic
        h = (
            (words * p[words.size - 1 :: -1]).sum(dtype=np.uint64)
            + _FNV_OFFSET * p[words.size]
        )
    return int(h)


# ------------------------------------------------------------------- synthesis


def ahash64(pixels: np.ndarray) -> int:
    """64-bit average-hash perceptual signature: grayscale → 8×8 block
    means → bit k set iff cell k's mean exceeds the median cell mean
    (little-endian bit order, k = row·8 + col).

    Unlike :func:`content_hash64` (avalanching — any pixel change flips
    ~32 bits), aHash is LOCALITY-PRESERVING: visually similar images
    differ in a few bits, so Hamming distance is a near-dup metric and
    the block-LSH pigeonhole search (ops/minhash.hamming_near_dup_pairs)
    finds all pairs under an exact cutoff."""
    g = pixels.astype(np.float64).mean(axis=2)
    h, w = g.shape
    ys = np.linspace(0, h, 9).astype(np.int64)
    xs = np.linspace(0, w, 9).astype(np.int64)
    # 8×8 block means via two reduceat passes — no per-cell Python loop
    cells = np.add.reduceat(np.add.reduceat(g, ys[:8], axis=0), xs[:8], axis=1)
    area = (ys[1:] - ys[:8])[:, None] * (xs[1:] - xs[:8])[None, :]
    cells = cells / area
    bits = (cells > np.median(cells)).astype(np.uint64).ravel()
    return int((bits << np.arange(64, dtype=np.uint64)).sum(dtype=np.uint64))


def image_dims(i: int) -> tuple[int, int]:
    """Deterministic (w, h) for row index i (FIXTURES.md F1)."""
    return 32 + (i % 4) * 16, 32 + (i % 3) * 16


def image_fmt(i: int) -> str:
    """Per-pixel-index format: bmp/png/q6 cycle, with every 16th slot
    (i % 16 == 5) overridden to real baseline JPEG. The 1/16 share keeps
    the only Python-loop decode (Huffman, georay/jpeg.py) off the decode
    stage's critical path while exercising a true DCT codec at every
    scale. SQL twin: CASE WHEN pix%16=5 THEN 'jpeg' ELSE pix%3 cycle END
    (period 48, divides PIXEL_PERIOD=768)."""
    if i % 16 == 5:
        return "jpeg"
    return _ROTATION[i % 3]


def synth_pixels(i: int, w: int | None = None, h: int | None = None) -> np.ndarray:
    """Deterministic RGB gradient+checker pattern seeded by the row index —
    the ground-truth pixel tensor every invariant check regenerates."""
    if w is None or h is None:
        w, h = image_dims(i)
    xx = np.arange(w, dtype=np.int64)[None, :]
    yy = np.arange(h, dtype=np.int64)[:, None]
    r = (xx * 7 + yy * 3 + i * 11) % 256
    g = (xx * 2 + yy * 5 + i * 29) % 256
    b = ((xx // 8 + yy // 8 + i) % 2) * 255
    out = np.empty((h, w, 3), dtype=np.uint8)
    out[:, :, 0] = r
    out[:, :, 1] = g
    out[:, :, 2] = b
    return out


# ------------------------------------------------- real media containers (r5)
#
# Pure-numpy parsers/writers for two REAL, public container formats —
# RIFF/WAVE (PCM16) and YUV4MPEG2 (y4m) — retiring the r4
# NotImplementedError stubs for "a compressed/structured container"
# (VERDICT r4 #5). Both are public knowledge: RIFF chunk walking per the
# Microsoft/IBM WAVE spec, Y4M per the mjpegtools header grammar. No
# codec library involved; payloads are PCM / raw planes, but the
# CONTAINER structure (chunk sizes, parameter strings, per-frame
# markers) is parsed for real and malformed input raises ValueError.


def encode_wav(pcm: np.ndarray, rate: int, channels: int = 1) -> bytes:
    """int16 PCM → canonical 44-byte-header RIFF/WAVE bytes."""
    import struct

    pcm = np.asarray(pcm, dtype="<i2")
    data = pcm.tobytes()
    block = 2 * channels
    hdr = struct.pack(
        "<4sI4s4sIHHIIHH4sI",
        b"RIFF", 36 + len(data), b"WAVE",
        b"fmt ", 16, 1, channels, rate, rate * block, block, 16,
        b"data", len(data),
    )
    return hdr + data


def decode_wav(data: bytes) -> tuple[int, int, np.ndarray]:
    """RIFF/WAVE → (rate, channels, int16 samples). A real chunk walk:
    finds ``fmt `` / ``data`` wherever they sit (extra chunks like LIST
    are skipped by size), validates PCM16."""
    import struct

    if len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE stream")
    pos, rate, channels, pcm = 12, None, None, None
    while pos + 8 <= len(data):
        tag = data[pos: pos + 4]
        (size,) = struct.unpack_from("<I", data, pos + 4)
        body = pos + 8
        if tag == b"fmt ":
            fmt_code, channels, rate = struct.unpack_from("<HHI", data, body)
            (bits,) = struct.unpack_from("<H", data, body + 14)
            if fmt_code != 1 or bits != 16:
                raise ValueError(
                    f"unsupported WAVE encoding (fmt={fmt_code}, bits={bits})"
                )
        elif tag == b"data":
            pcm = np.frombuffer(data, dtype="<i2", count=size // 2,
                                offset=body)
        pos = body + size + (size & 1)  # chunks are word-aligned
    if rate is None or pcm is None:
        raise ValueError("WAVE stream missing fmt /data chunk")
    return int(rate), int(channels), pcm


def encode_y4m(frames: np.ndarray, w: int, h: int) -> bytes:
    """(nf, w·h·3) uint8 planar C444 frames → YUV4MPEG2 bytes."""
    frames = np.asarray(frames, dtype=np.uint8)
    head = f"YUV4MPEG2 W{w} H{h} F25:1 Ip A1:1 C444\n".encode()
    marker = b"FRAME\n"
    return head + b"".join(marker + f.tobytes() for f in frames)


def decode_y4m(data: bytes) -> tuple[int, int, np.ndarray]:
    """YUV4MPEG2 → (w, h, (nf, w·h·3) uint8 frame payloads). Parses the
    parameter line (W/H/C tags in any order), walks the per-frame
    ``FRAME`` markers (parameters after FRAME are allowed by the spec and
    skipped to the newline), C444 only (full-res planes)."""
    nl = data.find(b"\n")
    if nl < 0 or not data.startswith(b"YUV4MPEG2"):
        raise ValueError("not a YUV4MPEG2 stream")
    w = h = None
    colorspace = "C420jpeg"  # the spec's default when no C tag is present
    for tok in data[9:nl].split():
        t = tok.decode("ascii", "replace")
        if t.startswith("W"):
            w = int(t[1:])
        elif t.startswith("H"):
            h = int(t[1:])
        elif t.startswith("C"):
            colorspace = t
    if w is None or h is None:
        raise ValueError("YUV4MPEG2 header missing W/H")
    if colorspace != "C444":
        raise ValueError(f"unsupported y4m colorspace {colorspace!r}")
    fb = w * h * 3
    out, pos = [], nl + 1
    while pos < len(data):
        if data[pos: pos + 5] != b"FRAME":
            raise ValueError("YUV4MPEG2 frame marker missing")
        fnl = data.find(b"\n", pos)
        body = fnl + 1
        out.append(np.frombuffer(data, dtype=np.uint8, count=fb, offset=body))
        pos = body + fb
    frames = (np.stack(out) if out
              else np.empty((0, fb), np.uint8))
    return w, h, frames
