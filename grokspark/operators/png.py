"""Pure-stdlib PNG codec (zlib + struct) — the REAL multimodal decode
step for this container (no external image codecs available).

Covers the subset a training-data feature extractor needs: 8-bit
greyscale / grey+alpha / RGB / RGBA, non-interlaced, all five scanline
filters (None/Sub/Up/Average/Paeth). The encoder fabricates
deterministic test payloads; the decoder powers
``grokspark.operators.multimodal`` feature extraction and its oracle.

Luma is integer-exact at comparison points: per-pixel
``299*R + 587*G + 114*B`` (milli-units, BT.601 weights x1000), summed
as a Python int, so Spark-vs-oracle comparisons never touch float
rounding.
"""

from __future__ import annotations

import hashlib
import struct
import zlib

__all__ = [
    "PNG_MAGIC",
    "encode_png",
    "decode_png",
    "png_features",
    "fake_png",
    "thumbnail_png",
    "VIDEO_MAGIC",
    "encode_video",
    "decode_video",
    "fake_video",
]

PNG_MAGIC = b"\x89PNG\r\n\x1a\n"

_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}  # color type -> samples per pixel


def _chunk(ctype: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data))
        + ctype
        + data
        + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
    )


def encode_png(width: int, height: int, rgb: bytes) -> bytes:
    """Minimal 8-bit RGB encoder: ``rgb`` is ``width*height*3`` raw
    bytes, rows top-to-bottom. Filter 0 on every scanline."""
    if len(rgb) != width * height * 3:
        raise ValueError(f"need {width * height * 3} bytes, got {len(rgb)}")
    stride = width * 3
    raw = b"".join(
        b"\x00" + rgb[y * stride : (y + 1) * stride] for y in range(height)
    )
    ihdr = struct.pack(">IIBBBBB", width, height, 8, 2, 0, 0, 0)
    return (
        PNG_MAGIC
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(raw, 6))
        + _chunk(b"IEND", b"")
    )


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def decode_png(data: bytes) -> dict:
    """Decode a PNG into ``{width, height, channels, pixels}`` where
    ``pixels`` is the unfiltered raw sample bytes (row-major).
    Supports bit depth 8, color types 0/2/4/6, no interlace."""
    if not data.startswith(PNG_MAGIC):
        raise ValueError("not a PNG (bad signature)")
    pos = len(PNG_MAGIC)
    width = height = None
    color_type = None
    idat = bytearray()
    while pos + 8 <= len(data):
        (length,) = struct.unpack_from(">I", data, pos)
        ctype = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + length]
        pos += 12 + length  # len + type + data + crc
        if ctype == b"IHDR":
            width, height, depth, color_type, comp, filt, interlace = struct.unpack(
                ">IIBBBBB", body
            )
            if depth != 8:
                raise ValueError(f"unsupported bit depth {depth}")
            if color_type not in _CHANNELS:
                raise ValueError(f"unsupported color type {color_type}")
            if interlace:
                raise ValueError("interlaced PNG not supported")
        elif ctype == b"IDAT":
            idat += body
        elif ctype == b"IEND":
            break
    if width is None:
        raise ValueError("missing IHDR")
    channels = _CHANNELS[color_type]
    raw = zlib.decompress(bytes(idat))
    stride = width * channels
    if len(raw) != (stride + 1) * height:
        raise ValueError("IDAT length mismatch")
    out = bytearray(stride * height)
    prev = bytes(stride)
    for y in range(height):
        ftype = raw[y * (stride + 1)]
        line = bytearray(raw[y * (stride + 1) + 1 : (y + 1) * (stride + 1)])
        if ftype == 1:  # Sub
            for i in range(channels, stride):
                line[i] = (line[i] + line[i - channels]) & 0xFF
        elif ftype == 2:  # Up
            for i in range(stride):
                line[i] = (line[i] + prev[i]) & 0xFF
        elif ftype == 3:  # Average
            for i in range(stride):
                left = line[i - channels] if i >= channels else 0
                line[i] = (line[i] + ((left + prev[i]) >> 1)) & 0xFF
        elif ftype == 4:  # Paeth
            for i in range(stride):
                left = line[i - channels] if i >= channels else 0
                upleft = prev[i - channels] if i >= channels else 0
                line[i] = (line[i] + _paeth(left, prev[i], upleft)) & 0xFF
        elif ftype != 0:
            raise ValueError(f"unknown filter type {ftype}")
        out[y * stride : (y + 1) * stride] = line
        prev = bytes(line)
    return {
        "width": width,
        "height": height,
        "channels": channels,
        "pixels": bytes(out),
    }


def png_features(data: bytes) -> dict:
    """width/height + integer-exact luma stats of a PNG payload:
    ``luma_milli`` is the sum over pixels of ``299*R + 587*G + 114*B``
    (grey: ``1000*Y``); ``mean_luma`` = luma_milli / (1000 * n_pixels),
    in 0..255."""
    img = decode_png(data)
    px, ch = img["pixels"], img["channels"]
    n = img["width"] * img["height"]
    luma_milli = 0
    if ch == 1:
        luma_milli = 1000 * sum(px)
    elif ch == 2:  # grey + alpha
        luma_milli = 1000 * sum(px[0::2])
    else:  # RGB / RGBA
        step = ch
        luma_milli = (
            299 * sum(px[0::step]) + 587 * sum(px[1::step]) + 114 * sum(px[2::step])
        )
    return {
        "width": img["width"],
        "height": img["height"],
        "luma_milli": luma_milli,
        "mean_luma": luma_milli / (1000.0 * n) if n else 0.0,
    }


def thumbnail_png(data: bytes, max_dim: int) -> bytes:
    """REAL image resize: decode, nearest-neighbor downsample so the
    longer side is <= ``max_dim`` (aspect preserved, floor mapping
    ``src = dst * src_dim // dst_dim`` — deterministic integers, no
    float resampling), re-encode as 8-bit RGB. Non-RGB inputs are
    normalized to RGB first (grey replicated, alpha dropped). Images
    already within ``max_dim`` are still normalized+re-encoded, so the
    output is uniformly RGB."""
    img = decode_png(data)
    w, h, ch, px = img["width"], img["height"], img["channels"], img["pixels"]
    scale = max(w, h) / max_dim if max(w, h) > max_dim else 1.0
    nw = max(1, int(w / scale)) if scale > 1 else w
    nh = max(1, int(h / scale)) if scale > 1 else h
    out = bytearray(nw * nh * 3)
    for y in range(nh):
        sy = y * h // nh
        row = sy * w * ch
        for x in range(nw):
            sx = x * w // nw
            p = row + sx * ch
            if ch == 1:
                r = g = b = px[p]
            elif ch == 2:
                r = g = b = px[p]
            else:
                r, g, b = px[p], px[p + 1], px[p + 2]
            o = (y * nw + x) * 3
            out[o] = r
            out[o + 1] = g
            out[o + 2] = b
    return encode_png(nw, nh, bytes(out))


# -- minimal video container (real, decodable, stdlib-only) -------------------
#
# Real video codecs aren't available in this container, but FRAME
# SAMPLING doesn't need one: GSV1 is a trivial length-prefixed
# concatenation of PNG frames. The container parse, frame extraction,
# stride selection, and per-frame decode are all real; only the codec
# inside each frame is (deliberately) PNG.

VIDEO_MAGIC = b"GSV1"


def encode_video(frames: list[bytes]) -> bytes:
    """GSV1 container: magic + frame count + length-prefixed frames."""
    out = bytearray(VIDEO_MAGIC)
    out += struct.pack(">I", len(frames))
    for f in frames:
        out += struct.pack(">I", len(f))
        out += f
    return bytes(out)


def decode_video(data: bytes) -> list[bytes]:
    """Parse a GSV1 container back into its frame payloads."""
    if data[:4] != VIDEO_MAGIC:
        raise ValueError("not a GSV1 container (bad magic)")
    (n,) = struct.unpack_from(">I", data, 4)
    pos = 8
    frames = []
    for _ in range(n):
        (ln,) = struct.unpack_from(">I", data, pos)
        pos += 4
        frames.append(data[pos : pos + ln])
        pos += ln
    if pos != len(data):
        raise ValueError("trailing bytes after last frame")
    return frames


def fake_video(key: str, text: str, n_frames: int = 4) -> bytes:
    """Deterministic GSV1 test payload: ``n_frames`` PNG frames, each a
    pure function of (key, frame index, text)."""
    return encode_video(
        [fake_png(f"{key}#frame{i}", text) for i in range(n_frames)]
    )


def fake_png(key: str, text: str) -> bytes:
    """Deterministic small RGB PNG derived from (key, text) — the test/
    bench payload fabricator. Dimensions 4..11 from the key digest;
    pixel bytes from a SHA-256 stream of the text."""
    kd = hashlib.sha256(key.encode("utf-8")).digest()
    width = 4 + kd[0] % 8
    height = 4 + kd[1] % 8
    need = width * height * 3
    stream = bytearray()
    counter = 0
    seed = text.encode("utf-8")
    while len(stream) < need:
        stream += hashlib.sha256(seed + counter.to_bytes(4, "big")).digest()
        counter += 1
    return encode_png(width, height, bytes(stream[:need]))
