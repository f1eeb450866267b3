"""Baseline JPEG codec — pure stdlib + numpy, no external image libs.

Closes the documented codec gap behind ``multimodal.decode_image``
(reference has no media layer at all; this is part of the
training-data-pipeline surface, like ``png.py``/``audio.py``).

Decoder: baseline sequential DCT (SOF0; SOF1 shares the code path),
Huffman entropy coding, grayscale or YCbCr with arbitrary sampling
factors (4:4:4 / 4:2:2 / 4:2:0), multi-table DQT/DHT segments, restart
markers (DRI/RSTn), FF00 byte unstuffing. Progressive (SOF2),
arithmetic coding, and hierarchical modes raise NotImplementedError
loudly — never a silent wrong decode.

Encoder: a minimal deterministic baseline encoder used to fabricate
test/bench payloads (grayscale, 4:4:4, or 4:2:0; optional restart
interval). It emits its own fixed canonical Huffman tables in DHT
(flat 9-bit AC / 4-bit DC code books — valid per the interchange
format, which carries tables in the stream; no Annex K constants
needed) and flat quantization tables by default. It is a test-payload
fabricator, not a quality-tuned codec.

Determinism contract (what the oracle gate relies on): decode is a
pure function of the payload bytes — integer IDCT rounding is done
once per block with float64 matrices and ``np.round`` + clip, so the
same payload yields identical features in every process. Flat-color
blocks round-trip BIT-EXACTLY through encode->decode (DC-only blocks:
FDCT DC = 8*(v-128) exactly, AC = 0), which the tests pin.
"""

from __future__ import annotations

import hashlib
import math
import struct
from typing import Optional

import numpy as np

__all__ = [
    "decode_jpeg",
    "encode_jpeg_baseline",
    "fake_jpeg",
    "jpeg_features",
    "JPEG_MAGIC",
]

JPEG_MAGIC = b"\xff\xd8\xff"

# zigzag: index in the coded stream -> (row, col) flat index
_ZIGZAG = np.array(
    [
        0, 1, 8, 16, 9, 2, 3, 10,
        17, 24, 32, 25, 18, 11, 4, 5,
        12, 19, 26, 33, 40, 48, 41, 34,
        27, 20, 13, 6, 7, 14, 21, 28,
        35, 42, 49, 56, 57, 50, 43, 36,
        29, 22, 15, 23, 30, 37, 44, 51,
        58, 59, 52, 45, 38, 31, 39, 46,
        53, 60, 61, 54, 47, 55, 62, 63,
    ],
    dtype=np.int64,
)


def _dct_matrix() -> np.ndarray:
    a = np.zeros((8, 8))
    for u in range(8):
        c = math.sqrt(0.5) if u == 0 else 1.0
        for x in range(8):
            a[u, x] = 0.5 * c * math.cos((2 * x + 1) * u * math.pi / 16)
    return a


_DCT = _dct_matrix()  # orthonormal: FDCT F = A X A^T, IDCT X = A^T F A


class JpegError(ValueError):
    pass


# ---------------------------------------------------------------------------
# Huffman tables
# ---------------------------------------------------------------------------


class _HuffDecoder:
    """Canonical Huffman decoder per T.81 Annex F (mincode/maxcode/
    valptr), built from the DHT (BITS, HUFFVAL) spec."""

    def __init__(self, bits: list, huffval: bytes):
        self.mincode = [0] * 17
        self.maxcode = [-1] * 17
        self.valptr = [0] * 17
        self.huffval = huffval
        code = 0
        k = 0
        for length in range(1, 17):
            n = bits[length - 1]
            if n:
                self.valptr[length] = k
                self.mincode[length] = code
                code += n
                k += n
                self.maxcode[length] = code - 1
            code <<= 1
        if k != len(huffval):
            raise JpegError("DHT count/value mismatch")

    def decode(self, reader: "_BitReader") -> int:
        code = reader.read_bit()
        length = 1
        while code > self.maxcode[length]:
            length += 1
            if length > 16:
                raise JpegError("invalid Huffman code in scan")
            code = (code << 1) | reader.read_bit()
        return self.huffval[self.valptr[length] + code - self.mincode[length]]


class _BitReader:
    """MSB-first bit reader over one (already unstuffed) entropy-coded
    restart segment."""

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.bitbuf = 0
        self.nbits = 0

    def read_bit(self) -> int:
        if self.nbits == 0:
            if self.pos >= len(self.data):
                # past-the-end bits read as 1s (spec: the final byte is
                # padded with 1-bits; a conforming stream only reads a
                # few of these while finishing the last EOB run)
                return 1
            self.bitbuf = self.data[self.pos]
            self.pos += 1
            self.nbits = 8
        self.nbits -= 1
        return (self.bitbuf >> self.nbits) & 1

    def receive(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v


def _extend(v: int, s: int) -> int:
    """T.81 F.12: map the s-bit magnitude field to a signed value."""
    if s == 0:
        return 0
    return v if v >= (1 << (s - 1)) else v - (1 << s) + 1


# ---------------------------------------------------------------------------
# Decoder
# ---------------------------------------------------------------------------


def _split_entropy(data: bytes, start: int) -> tuple:
    """Unstuff FF00 and split the scan's entropy data on restart
    markers. Returns (segments, pos_after_scan)."""
    segments = []
    cur = bytearray()
    i = start
    n = len(data)
    while i < n:
        b = data[i]
        if b != 0xFF:
            cur.append(b)
            i += 1
            continue
        if i + 1 >= n:
            break
        m = data[i + 1]
        if m == 0x00:
            cur.append(0xFF)
            i += 2
        elif 0xD0 <= m <= 0xD7:  # RSTn
            segments.append(bytes(cur))
            cur = bytearray()
            i += 2
        else:  # next real marker ends the scan
            break
    segments.append(bytes(cur))
    return segments, i


def _decode_planes(data: bytes) -> dict:
    """Parse markers and entropy-decode every component plane.

    Returns {"width", "height", "planes": [np.uint8 2-D per component,
    cropped to that component's true (subsampled) dims], "sampling":
    [(h, v), ...]}."""
    if data[:3] != JPEG_MAGIC:
        raise JpegError("not a JPEG payload (SOI missing)")
    qtables: dict = {}
    huff_dc: dict = {}
    huff_ac: dict = {}
    frame = None
    restart_interval = 0
    i = 2
    n = len(data)
    while i < n:
        if data[i] != 0xFF:
            raise JpegError(f"expected marker at offset {i}")
        marker = data[i + 1]
        i += 2
        if marker == 0xD9:  # EOI
            break
        if marker in (0x01,) or 0xD0 <= marker <= 0xD7:
            continue  # standalone
        (seglen,) = struct.unpack(">H", data[i : i + 2])
        seg = data[i + 2 : i + seglen]
        i += seglen
        if marker == 0xDB:  # DQT (may hold several tables)
            p = 0
            while p < len(seg):
                prec, tid = seg[p] >> 4, seg[p] & 15
                p += 1
                if prec:
                    q = np.frombuffer(seg[p : p + 128], dtype=">u2").astype(np.int64)
                    p += 128
                else:
                    q = np.frombuffer(seg[p : p + 64], dtype=np.uint8).astype(np.int64)
                    p += 64
                qtables[tid] = q  # zigzag order
        elif marker == 0xC4:  # DHT (may hold several tables)
            p = 0
            while p < len(seg):
                tc, th = seg[p] >> 4, seg[p] & 15
                bits = list(seg[p + 1 : p + 17])
                nv = sum(bits)
                vals = seg[p + 17 : p + 17 + nv]
                p += 17 + nv
                (huff_dc if tc == 0 else huff_ac)[th] = _HuffDecoder(bits, vals)
        elif marker in (0xC0, 0xC1):  # SOF0 / SOF1 (baseline path)
            _prec, h, w, nc = struct.unpack(">BHHB", seg[:6])
            comps = []
            for c in range(nc):
                cid, hv, tq = seg[6 + 3 * c : 9 + 3 * c]
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 15, "tq": tq})
            frame = {"w": w, "h": h, "comps": comps}
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                f"JPEG SOF{marker - 0xC0}: only baseline sequential "
                "(SOF0/SOF1) is implemented — progressive/arithmetic/"
                "hierarchical payloads are rejected loudly"
            )
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack(">H", seg[:2])
        elif marker == 0xDA:  # SOS
            if frame is None:
                raise JpegError("SOS before SOF")
            ns = seg[0]
            scan = []
            for c in range(ns):
                cs, tables = seg[1 + 2 * c : 3 + 2 * c]
                comp = next(x for x in frame["comps"] if x["id"] == cs)
                scan.append((comp, tables >> 4, tables & 15))
            segments, i = _split_entropy(data, i)
            planes = _decode_scan(
                frame, scan, qtables, huff_dc, huff_ac, segments, restart_interval
            )
            return planes
    raise JpegError("no SOS scan found")


def _decode_scan(frame, scan, qtables, huff_dc, huff_ac, segments, restart_interval):
    w, h, comps = frame["w"], frame["h"], frame["comps"]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    interleaved = len(scan) > 1

    # per scanned component: block-grid dims and coefficient store
    layout = []
    for comp, tdc, tac in scan:
        if interleaved:
            bw = -(-w // (8 * hmax)) * comp["h"]
            bh = -(-h // (8 * vmax)) * comp["v"]
        else:
            cw = -(-w * comp["h"] // hmax)
            ch = -(-h * comp["v"] // vmax)
            bw, bh = -(-cw // 8), -(-ch // 8)
        layout.append(
            {
                "comp": comp,
                "dc": huff_dc[tdc],
                "ac": huff_ac[tac],
                "q": qtables[comp["tq"]],
                "bw": bw,
                "bh": bh,
                "coeffs": np.zeros((bh * bw, 64), dtype=np.int64),
            }
        )

    if interleaved:
        mcus_x = -(-w // (8 * hmax))
        mcus_y = -(-h // (8 * vmax))
        total_mcus = mcus_x * mcus_y
    else:
        total_mcus = layout[0]["bw"] * layout[0]["bh"]

    per_seg = restart_interval or total_mcus
    mcu = 0
    for seg_bytes in segments:
        if mcu >= total_mcus:
            break
        reader = _BitReader(seg_bytes)
        preds = [0] * len(layout)
        for _ in range(min(per_seg, total_mcus - mcu)):
            if interleaved:
                my, mx = divmod(mcu, mcus_x)
                for li, lay in enumerate(layout):
                    ch_, cv = lay["comp"]["h"], lay["comp"]["v"]
                    for by in range(cv):
                        for bx in range(ch_):
                            idx = (my * cv + by) * lay["bw"] + (mx * ch_ + bx)
                            preds[li] = _decode_block(
                                reader, lay, idx, preds[li]
                            )
            else:
                preds[0] = _decode_block(reader, layout[0], mcu, preds[0])
            mcu += 1
    if mcu < total_mcus:
        raise JpegError(f"scan ended after {mcu}/{total_mcus} MCUs")

    # dequantize + de-zigzag + batched IDCT per component
    planes = []
    for lay in layout:
        comp = lay["comp"]
        deq = lay["coeffs"] * lay["q"][None, :]  # both zigzag order
        blocks = np.zeros((len(deq), 64))
        blocks[:, _ZIGZAG] = deq
        blocks = blocks.reshape(-1, 8, 8)
        pix = np.einsum("ij,njk,kl->nil", _DCT.T, blocks, _DCT) + 128.0
        pix = np.clip(np.round(pix), 0, 255).astype(np.uint8)
        plane = (
            pix.reshape(lay["bh"], lay["bw"], 8, 8)
            .transpose(0, 2, 1, 3)
            .reshape(lay["bh"] * 8, lay["bw"] * 8)
        )
        cw = -(-w * comp["h"] // hmax)
        ch2 = -(-h * comp["v"] // vmax)
        planes.append(plane[:ch2, :cw])
    return {
        "width": w,
        "height": h,
        "planes": planes,
        "sampling": [(c["h"], c["v"]) for c in comps],
    }


def _decode_block(reader, lay, idx, pred) -> int:
    """Decode one block's coefficients (zigzag order) into
    lay['coeffs'][idx]; returns the updated DC predictor."""
    row = lay["coeffs"][idx]
    s = lay["dc"].decode(reader)
    pred += _extend(reader.receive(s), s)
    row[0] = pred
    k = 1
    while k < 64:
        rs = lay["ac"].decode(reader)
        r, s = rs >> 4, rs & 15
        if s == 0:
            if r == 15:  # ZRL
                k += 16
                continue
            break  # EOB
        k += r
        if k > 63:
            raise JpegError("AC run past block end")
        row[k] = _extend(reader.receive(s), s)
        k += 1
    return pred


def _upsample(plane: np.ndarray, width: int, height: int) -> np.ndarray:
    """Nearest-neighbor chroma upsample to full resolution."""
    ch, cw = plane.shape
    ys = np.minimum(np.arange(height) * ch // height, ch - 1)
    xs = np.minimum(np.arange(width) * cw // width, cw - 1)
    return plane[np.ix_(ys, xs)]


def decode_jpeg(data: bytes) -> dict:
    """Decode a baseline JPEG into ``{width, height, channels,
    pixels}`` — the same shape ``png.decode_png`` returns (flat
    row-major pixel list; channels 1 = grayscale Y, 3 = RGB via
    BT.601 from YCbCr)."""
    d = _decode_planes(data)
    w, h = d["width"], d["height"]
    planes = d["planes"]
    if len(planes) == 1:
        return {
            "width": w,
            "height": h,
            "channels": 1,
            "pixels": planes[0].reshape(-1).tolist(),
        }
    if len(planes) != 3:
        raise JpegError(f"unsupported component count {len(planes)}")
    y = planes[0].astype(np.float64)
    cb = _upsample(planes[1], w, h).astype(np.float64) - 128.0
    cr = _upsample(planes[2], w, h).astype(np.float64) - 128.0
    rgb = np.stack(
        [
            y + 1.402 * cr,
            y - 0.344136 * cb - 0.714136 * cr,
            y + 1.772 * cb,
        ],
        axis=-1,
    )
    rgb = np.clip(np.round(rgb), 0, 255).astype(np.uint8)
    return {
        "width": w,
        "height": h,
        "channels": 3,
        "pixels": rgb.reshape(-1).tolist(),
    }


def jpeg_features(data: bytes) -> dict:
    """width/height + luma stats, same keys/units as
    ``png.png_features``. For JPEG the decoded Y plane IS the BT.601
    luma of the image, so ``luma_milli = 1000 * sum(Y)`` is computed
    directly from the Y component — exact w.r.t. the coded stream and
    independent of chroma-upsampling choices."""
    d = _decode_planes(data)
    y = d["planes"][0]
    n = d["width"] * d["height"]
    luma_milli = 1000 * int(y.sum(dtype=np.int64))
    return {
        "width": d["width"],
        "height": d["height"],
        "luma_milli": luma_milli,
        "mean_luma": luma_milli / (1000.0 * n) if n else 0.0,
    }


# ---------------------------------------------------------------------------
# Encoder (deterministic test-payload fabricator)
# ---------------------------------------------------------------------------

# fixed canonical code books (emitted in DHT): DC = 12 symbols at 4
# bits (codes 0..11; 15 = all-ones stays unused, as T.81 C.2 requires);
# AC = all 162 baseline symbols at 9 bits (codes 0..161 < 511)
_ENC_DC_BITS = [0, 0, 0, 12] + [0] * 12
_ENC_DC_VALS = bytes(range(12))
_ENC_AC_VALS = bytes(
    [0x00, 0xF0]
    + [(r << 4) | s for r in range(16) for s in range(1, 11)]
)
_ENC_AC_BITS = [0] * 8 + [len(_ENC_AC_VALS)] + [0] * 7


def _enc_codes(bits, vals) -> dict:
    codes = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            codes[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return codes


_ENC_DC_CODES = _enc_codes(_ENC_DC_BITS, _ENC_DC_VALS)
_ENC_AC_CODES = _enc_codes(_ENC_AC_BITS, _ENC_AC_VALS)


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            self.nbits -= 8
            b = (self.acc >> self.nbits) & 0xFF
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)  # byte stuffing

    def flush(self) -> None:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # pad with 1-bits per spec


def _magnitude(v: int) -> tuple:
    s = int(v).bit_length() if v >= 0 else int(-v).bit_length()
    if s == 0:
        return 0, 0
    field = v if v >= 0 else v + (1 << s) - 1
    return s, field


def _encode_blocks(writer, blocks_zz: np.ndarray, pred: int) -> int:
    for row in blocks_zz:
        dc = int(row[0])
        s, field = _magnitude(dc - pred)
        pred = dc
        c, ln = _ENC_DC_CODES[s]
        writer.write(c, ln)
        if s:
            writer.write(field, s)
        run = 0
        last = 63
        while last > 0 and row[last] == 0:
            last -= 1
        for k in range(1, last + 1):
            v = int(row[k])
            if v == 0:
                run += 1
                continue
            while run > 15:
                c, ln = _ENC_AC_CODES[0xF0]
                writer.write(c, ln)
                run -= 16
            s, field = _magnitude(v)
            if s > 10:
                raise JpegError("coefficient magnitude beyond baseline range")
            c, ln = _ENC_AC_CODES[(run << 4) | s]
            writer.write(c, ln)
            writer.write(field, s)
            run = 0
        if last < 63:
            c, ln = _ENC_AC_CODES[0x00]  # EOB
            writer.write(c, ln)
    return pred


def _plane_blocks(plane: np.ndarray, q: np.ndarray) -> np.ndarray:
    """Pad to 8-multiples (edge replication), FDCT, quantize; returns
    (n_blocks, 64) int coefficients in zigzag order, block-row-major."""
    h, w = plane.shape
    ph, pw = -(-h // 8) * 8, -(-w // 8) * 8
    padded = np.empty((ph, pw))
    padded[:h, :w] = plane
    if pw > w:
        padded[:h, w:] = plane[:, -1:]
    if ph > h:
        padded[h:, :] = padded[h - 1 : h, :]
    blocks = (
        padded.reshape(ph // 8, 8, pw // 8, 8).transpose(0, 2, 1, 3).reshape(-1, 8, 8)
    ) - 128.0
    coeffs = np.einsum("ij,njk,kl->nil", _DCT, blocks, _DCT.T).reshape(-1, 64)
    zz = coeffs[:, _ZIGZAG]
    return np.round(zz / q[None, :]).astype(np.int64)


def encode_jpeg_baseline(
    width: int,
    height: int,
    pixels: bytes,
    channels: int = 3,
    quant: Optional[np.ndarray] = None,
    subsample_420: bool = False,
    restart_interval: int = 0,
) -> bytes:
    """Minimal deterministic baseline JPEG encoder (grayscale, 4:4:4,
    or 4:2:0 YCbCr; optional restart markers). ``quant`` is one
    zigzag-order 64-entry table used for every component (default all
    ones — near-lossless for smooth content, bit-exact for flat
    blocks). Interchange format: emits its own DQT/DHT."""
    q = np.ones(64, dtype=np.int64) if quant is None else np.asarray(quant, np.int64)
    px = np.frombuffer(bytes(pixels), dtype=np.uint8).astype(np.float64)
    if channels == 1:
        planes = [px.reshape(height, width)]
        samplings = [(1, 1)]
    elif channels == 3:
        rgb = px.reshape(height, width, 3)
        r, g, b = rgb[..., 0], rgb[..., 1], rgb[..., 2]
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
        if subsample_420:
            planes = [y, _box_half(cb), _box_half(cr)]
            samplings = [(2, 2), (1, 1), (1, 1)]
        else:
            planes = [y, cb, cr]
            samplings = [(1, 1), (1, 1), (1, 1)]
    else:
        raise JpegError(f"unsupported channel count {channels}")

    out = bytearray(b"\xff\xd8")  # SOI
    out += b"\xff\xdb" + struct.pack(">HB", 67, 0)  # DQT, table 0
    out += bytes(int(v) for v in q)
    out += b"\xff\xc0" + struct.pack(
        ">HBHHB", 8 + 3 * len(planes), 8, height, width, len(planes)
    )
    for ci, (sh, sv) in enumerate(samplings):
        out += bytes([ci + 1, (sh << 4) | sv, 0])
    for tc, bits, vals in (
        (0, _ENC_DC_BITS, _ENC_DC_VALS),
        (1, _ENC_AC_BITS, _ENC_AC_VALS),
    ):
        out += b"\xff\xc4" + struct.pack(">HB", 19 + len(vals), tc << 4)
        out += bytes(bits) + vals
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)
    out += b"\xff\xda" + struct.pack(">HB", 6 + 2 * len(planes), len(planes))
    for ci in range(len(planes)):
        out += bytes([ci + 1, 0x00])
    out += b"\x00\x3f\x00"  # Ss/Se/Ah-Al

    hmax = max(s[0] for s in samplings)
    vmax = max(s[1] for s in samplings)
    comp_blocks = []
    for plane, (sh, sv) in zip(planes, samplings):
        if len(planes) == 1:
            bw = -(-width // 8)
        else:
            bw = -(-width // (8 * hmax)) * sh
            bh = -(-height // (8 * vmax)) * sv
            # pad the plane so its block grid matches the MCU grid
            ph, pw = bh * 8, bw * 8
            padded = np.empty((ph, pw))
            h0, w0 = plane.shape
            padded[:h0, :w0] = plane
            if pw > w0:
                padded[:h0, w0:] = plane[:, -1:]
            if ph > h0:
                padded[h0:, :] = padded[h0 - 1 : h0, :]
            plane = padded
        comp_blocks.append((_plane_blocks(plane, q), sh, sv))

    writer = _BitWriter()
    if len(planes) == 1:
        pred = _encode_blocks(writer, comp_blocks[0][0], 0)
    else:
        mcus_x = -(-width // (8 * hmax))
        mcus_y = -(-height // (8 * vmax))
        preds = [0] * len(planes)
        since_rst = 0
        rst = 0
        for my in range(mcus_y):
            for mx in range(mcus_x):
                if restart_interval and since_rst == restart_interval:
                    writer.flush()
                    writer.out += bytes([0xFF, 0xD0 + rst])
                    rst = (rst + 1) & 7
                    preds = [0] * len(planes)
                    since_rst = 0
                for ci, (blocks, sh, sv) in enumerate(comp_blocks):
                    bw = -(-width // (8 * hmax)) * sh
                    for by in range(sv):
                        for bx in range(sh):
                            idx = (my * sv + by) * bw + (mx * sh + bx)
                            preds[ci] = _encode_blocks(
                                writer, blocks[idx : idx + 1], preds[ci]
                            )
                since_rst += 1
    writer.flush()
    out += writer.out
    out += b"\xff\xd9"  # EOI
    return bytes(out)


def _box_half(plane: np.ndarray) -> np.ndarray:
    """2x2 box-average downsample (pads odd dims by edge replication)."""
    h, w = plane.shape
    if h % 2 or w % 2:
        padded = np.empty((h + h % 2, w + w % 2))
        padded[:h, :w] = plane
        if w % 2:
            padded[:h, w:] = plane[:, -1:]
        if h % 2:
            padded[h:, :] = padded[h - 1 : h, :]
        plane = padded
        h, w = plane.shape
    return plane.reshape(h // 2, 2, w // 2, 2).mean(axis=(1, 3))


def fake_jpeg(key: str, text: str, subsample_420: bool = False) -> bytes:
    """Deterministic small RGB JPEG derived from (key, text) — the
    JPEG twin of ``png.fake_png`` (same digest-stream pixel recipe,
    dims 4..11), for test/bench payload fabrication."""
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
    return encode_jpeg_baseline(
        width, height, bytes(stream[:need]), channels=3, subsample_420=subsample_420
    )
