"""Baseline JPEG codec — pure python/numpy (no PIL in the sandbox).

The third real codec after PNG and WAV (operators/multimodal.py): a
JFIF baseline sequential encoder/decoder pair implementing the actual
format — standard Annex-K quantization + Huffman tables, zigzag, DC
prediction, byte stuffing, 8x8 float DCT/IDCT — covering the shapes a
curation pipeline meets most: 8-bit baseline, 1 (grayscale) or 3
(YCbCr) components at 4:4:4, 4:2:2, or the dominant real-photo 4:2:0
chroma subsampling (interleaved multi-block MCUs; box downsample on
encode, replication upsample on decode). Progressive scans and restart
intervals are detected and FLAGGED (ValueError), never silently
mis-decoded, matching the PNG/PDF strict-mode policy.

JPEG is lossy, so unlike PNG there is no bit-exact round trip in
general. Two exactness anchors make it testable and oracle-checkable:

* decode(encode(x)) is DETERMINISTIC (same floats, same rounding), so
  stability and PSNR floors are solid assertions; and
* a FLAT grayscale block survives exactly when ``8*(c-128)`` is
  divisible by the DC quantizer: DCT of a constant block is DC-only,
  so quantize/dequantize is exact and the decoded block equals the
  constant — giving a closed-form integer pixel_sum the DuckDB oracle
  recomputes (multimodal_decode_jpeg).
"""

from __future__ import annotations

import struct

import numpy as np

# ITU-T T.81 Annex K quantization tables (quality 50 base)
QUANT_LUM = np.array([
    [16, 11, 10, 16, 24, 40, 51, 61],
    [12, 12, 14, 19, 26, 58, 60, 55],
    [14, 13, 16, 24, 40, 57, 69, 56],
    [14, 17, 22, 29, 51, 87, 80, 62],
    [18, 22, 37, 56, 68, 109, 103, 77],
    [24, 35, 55, 64, 81, 104, 113, 92],
    [49, 64, 78, 87, 103, 121, 120, 101],
    [72, 92, 95, 98, 112, 100, 103, 99],
], dtype=np.int32)
QUANT_CHROM = np.array([
    [17, 18, 24, 47, 99, 99, 99, 99],
    [18, 21, 26, 66, 99, 99, 99, 99],
    [24, 26, 56, 99, 99, 99, 99, 99],
    [47, 66, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99],
], dtype=np.int32)

_ZZ = np.array([
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
])

# Annex K Huffman table specs: (bits[1..16], values)
_DC_LUM = (
    [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
    list(range(12)),
)
_DC_CHROM = (
    [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
    list(range(12)),
)
_AC_LUM = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 125],
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
     0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA],
)
_AC_CHROM = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 119],
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
     0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA],
)


def _dct_matrix() -> np.ndarray:
    """Orthonormal 8x8 DCT-II matrix: X = C @ block @ C.T gives the
    JPEG coefficient scaling (DC of a constant-c block = 8*c)."""
    k = np.arange(8)
    c = np.cos((2 * k[None, :] + 1) * k[:, None] * np.pi / 16)
    m = c * np.sqrt(2.0 / 8.0)
    m[0, :] = np.sqrt(1.0 / 8.0)
    return m


_C = _dct_matrix()


def _scaled_tables(quality: int) -> tuple[np.ndarray, np.ndarray]:
    """IJG quality scaling of the Annex-K tables (1..100)."""
    quality = min(max(int(quality), 1), 100)
    s = 5000 // quality if quality < 50 else 200 - 2 * quality
    out = []
    for t in (QUANT_LUM, QUANT_CHROM):
        q = (t * s + 50) // 100
        out.append(np.clip(q, 1, 255).astype(np.int32))
    return out[0], out[1]


class _HuffEncoder:
    def __init__(self, spec):
        bits, values = spec
        self.codes: dict[int, tuple[int, int]] = {}
        code = 0
        idx = 0
        for ln in range(1, 17):
            for _ in range(bits[ln - 1]):
                self.codes[values[idx]] = (code, ln)
                code += 1
                idx += 1
            code <<= 1


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            byte = (self.acc >> (self.nbits - 8)) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:
                self.out.append(0x00)  # byte stuffing
            self.nbits -= 8
        self.acc &= (1 << self.nbits) - 1

    def flush(self) -> None:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # 1-fill per spec


def _magnitude(v: int) -> tuple[int, int]:
    """(size, amplitude bits) encoding of a signed coefficient."""
    if v == 0:
        return 0, 0
    a = abs(v)
    size = a.bit_length()
    bits = v if v > 0 else v + (1 << size) - 1
    return size, bits


def _encode_block(bw, zz: np.ndarray, prev_dc: int, dc: _HuffEncoder, ac: _HuffEncoder) -> int:
    diff = int(zz[0]) - prev_dc
    size, bits = _magnitude(diff)
    code, ln = dc.codes[size]
    bw.write(code, ln)
    if size:
        bw.write(bits, size)
    run = 0
    last_nz = 0
    for i in range(63, 0, -1):
        if zz[i] != 0:
            last_nz = i
            break
    for i in range(1, last_nz + 1):
        v = int(zz[i])
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, ln = ac.codes[0xF0]  # ZRL
            bw.write(code, ln)
            run -= 16
        size, bits = _magnitude(v)
        code, ln = ac.codes[(run << 4) | size]
        bw.write(code, ln)
        bw.write(bits, size)
        run = 0
    if last_nz != 63:
        code, ln = ac.codes[0x00]  # EOB
        bw.write(code, ln)
    return int(zz[0])


def _block_grid(plane: np.ndarray, qtab: np.ndarray, bh: int, bw_: int) -> list:
    """Pad to a (bh, bw_) grid of 8x8 blocks (edge replicate) and return
    quantized zigzag blocks indexed ``grid[by][bx]``."""
    h, w = plane.shape
    padded = np.pad(
        plane, ((0, bh * 8 - h), (0, bw_ * 8 - w)), mode="edge"
    ).astype(np.float64)
    padded -= 128.0
    grid = []
    for by in range(bh):
        row = []
        for bx in range(bw_):
            block = padded[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8]
            coef = _C @ block @ _C.T
            row.append(np.round(coef / qtab).astype(np.int32).flatten()[_ZZ])
        grid.append(row)
    return grid


# sampling-factor (h, v) per Y/Cb/Cr component for each supported mode
_SAMPLING = {
    "444": ((1, 1), (1, 1), (1, 1)),
    "422": ((2, 1), (1, 1), (1, 1)),
    "420": ((2, 2), (1, 1), (1, 1)),
}


def write_jpeg(pixels: np.ndarray, quality: int = 75, subsampling: str = "444") -> bytes:
    """uint8 (h, w) grayscale or (h, w, 3) RGB -> baseline JFIF bytes
    with standard tables. ``subsampling``: "444" (no subsampling),
    "422" (chroma halved horizontally), or "420" (halved both ways —
    the dominant real-photo shape: 16x16-pixel MCUs of 4 Y blocks +
    1 Cb + 1 Cr). Chroma is box-downsampled (block mean), so flat
    chroma stays flat and the flat-block exactness anchor survives
    every mode."""
    gray = pixels.ndim == 2 or pixels.shape[2] == 1
    if pixels.ndim == 3 and pixels.shape[2] == 1:
        pixels = pixels[:, :, 0]
    h, w = pixels.shape[:2]
    qlum, qchrom = _scaled_tables(quality)
    if subsampling not in _SAMPLING:
        raise ValueError(f"unsupported subsampling mode {subsampling!r}")
    samp = (((1, 1),) if gray else _SAMPLING[subsampling])[: 1 if gray else 3]
    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)
    mcux, mcuy = -(-w // (8 * hmax)), -(-h // (8 * vmax))

    if gray:
        planes = [(pixels.astype(np.float64), qlum, 0)]
    else:
        rgb = pixels.astype(np.float64)
        r, g, b = rgb[:, :, 0], rgb[:, :, 1], rgb[:, :, 2]
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
        # pad to full-MCU size BEFORE downsampling so box means never
        # straddle the replicated edge inconsistently across components
        ph, pw = mcuy * vmax * 8, mcux * hmax * 8
        full = [
            np.pad(p, ((0, ph - h), (0, pw - w)), mode="edge") for p in (y, cb, cr)
        ]
        planes = []
        for p, (hi, vi), (q, cls) in zip(
            full, samp, ((qlum, 0), (qchrom, 1), (qchrom, 1))
        ):
            fy, fx = vmax // vi, hmax // hi
            if fy > 1 or fx > 1:  # box filter: mean over each fy x fx cell
                p = p.reshape(ph // fy, fy, pw // fx, fx).mean(axis=(1, 3))
            planes.append((p, q, cls))

    out = bytearray(b"\xff\xd8")  # SOI
    out += b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
    for tid, q in ((0, qlum),) if gray else ((0, qlum), (1, qchrom)):
        out += b"\xff\xdb" + struct.pack(">H", 67) + bytes([tid])
        out += bytes(int(v) for v in q.flatten()[_ZZ])
    ncomp = 1 if gray else 3
    out += b"\xff\xc0" + struct.pack(">HBHHB", 8 + 3 * ncomp, 8, h, w, ncomp)
    for cid in range(1, ncomp + 1):
        hi, vi = samp[cid - 1]
        qt = 0 if cid == 1 else 1
        out += bytes([cid, (hi << 4) | vi, qt])
    specs = ((0x00, _DC_LUM), (0x10, _AC_LUM)) if gray else (
        (0x00, _DC_LUM), (0x10, _AC_LUM), (0x01, _DC_CHROM), (0x11, _AC_CHROM)
    )
    for tc_th, (bits, values) in specs:
        out += b"\xff\xc4" + struct.pack(">H", 19 + len(values)) + bytes([tc_th])
        out += bytes(bits) + bytes(values)
    out += b"\xff\xda" + struct.pack(">HB", 6 + 2 * ncomp, ncomp)
    for cid in range(1, ncomp + 1):
        tabs = 0x00 if cid == 1 else 0x11
        out += bytes([cid, tabs])
    out += b"\x00\x3f\x00"  # Ss/Se/AhAl

    dc_l, ac_l = _HuffEncoder(_DC_LUM), _HuffEncoder(_AC_LUM)
    dc_c, ac_c = _HuffEncoder(_DC_CHROM), _HuffEncoder(_AC_CHROM)
    bw = _BitWriter()
    grids = [
        _block_grid(p, q, mcuy * samp[ci][1], mcux * samp[ci][0])
        for ci, (p, q, _) in enumerate(planes)
    ]
    prev = [0] * len(planes)
    # interleaved MCU order: per component, vi x hi blocks raster-wise
    for my in range(mcuy):
        for mx in range(mcux):
            for ci, (_, _, cls) in enumerate(planes):
                hi, vi = samp[ci]
                for vy in range(vi):
                    for hx in range(hi):
                        zz = grids[ci][my * vi + vy][mx * hi + hx]
                        prev[ci] = _encode_block(
                            bw, zz, prev[ci],
                            dc_c if cls else dc_l, ac_c if cls else ac_l,
                        )
    bw.flush()
    out += bw.out
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# -------------------------------------------------------------- decoder


class _HuffDecoder:
    def __init__(self, bits, values):
        self.lookup: dict[tuple[int, int], int] = {}
        code = 0
        idx = 0
        for ln in range(1, 17):
            for _ in range(bits[ln - 1]):
                self.lookup[(ln, code)] = values[idx]
                code += 1
                idx += 1
            code <<= 1

    def decode(self, br) -> int:
        code = 0
        for ln in range(1, 17):
            code = (code << 1) | br.bit()
            v = self.lookup.get((ln, code))
            if v is not None:
                return v
        raise ValueError("invalid JPEG Huffman code")


class _BitReader:
    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.acc = 0
        self.nbits = 0

    def bit(self) -> int:
        if self.nbits == 0:
            if self.pos >= len(self.data):
                raise ValueError("JPEG entropy data exhausted")
            byte = self.data[self.pos]
            self.pos += 1
            if byte == 0xFF:
                if self.pos < len(self.data) and self.data[self.pos] == 0x00:
                    self.pos += 1  # destuff
                else:
                    raise ValueError("unexpected marker in entropy data")
            self.acc = byte
            self.nbits = 8
        self.nbits -= 1
        return (self.acc >> self.nbits) & 1

    def receive(self, size: int) -> int:
        v = 0
        for _ in range(size):
            v = (v << 1) | self.bit()
        return v


def _extend(v: int, size: int) -> int:
    return v if size == 0 or v >= (1 << (size - 1)) else v - (1 << size) + 1


def is_jpeg(blob: bytes | None) -> bool:
    return bool(blob) and blob[:3] == b"\xff\xd8\xff"


def decode_jpeg(blob: bytes) -> tuple[int, int, int, np.ndarray]:
    """JPEG bytes -> (width, height, channels, uint8 pixels (h, w, ch)).
    Baseline sequential, 8-bit, 1 or 3 components, any integer sampling
    factors whose ratios divide the maximum (covers 4:4:4, 4:2:2 and
    the dominant real-photo 4:2:0 shape; subsampled planes upsample by
    sample replication). Progressive scans and restart intervals raise
    ValueError (flag), never silently mis-decode."""
    if not is_jpeg(blob):
        raise ValueError("not a JPEG (bad signature)")
    pos = 2
    qtabs: dict[int, np.ndarray] = {}
    huff: dict[int, _HuffDecoder] = {}
    h = w = None
    comps: list[tuple[int, int, int, int]] = []  # (id, quant table, hi, vi)
    scan_tabs: list[tuple[int, int]] = []
    entropy = None
    while pos + 4 <= len(blob):
        if blob[pos] != 0xFF:
            raise ValueError("JPEG marker expected")
        marker = blob[pos + 1]
        if marker == 0xD9:
            break
        (seglen,) = struct.unpack(">H", blob[pos + 2 : pos + 4])
        seg = blob[pos + 4 : pos + 2 + seglen]
        pos += 2 + seglen
        if marker == 0xDB:
            off = 0
            while off < len(seg):
                prec_id = seg[off]
                if prec_id >> 4 != 0:
                    raise ValueError("16-bit quant tables unsupported")
                tab = np.zeros(64, dtype=np.int32)
                tab[_ZZ] = np.frombuffer(seg[off + 1 : off + 65], dtype=np.uint8)
                qtabs[prec_id & 0x0F] = tab.reshape(8, 8)
                off += 65
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB):
            raise ValueError(f"non-baseline JPEG (SOF{marker - 0xC0}) unsupported")
        elif marker == 0xC0:
            _prec, h, w, ncomp = struct.unpack(">BHHB", seg[:6])
            for ci in range(ncomp):
                cid, sampling, qt = seg[6 + 3 * ci : 9 + 3 * ci]
                hi, vi = sampling >> 4, sampling & 0x0F
                if not (1 <= hi <= 4 and 1 <= vi <= 4):
                    raise ValueError("invalid JPEG sampling factors")
                comps.append((cid, qt, hi, vi))
        elif marker == 0xC4:
            off = 0
            while off < len(seg):
                tc_th = seg[off]
                bits = list(seg[off + 1 : off + 17])
                nval = sum(bits)
                values = list(seg[off + 17 : off + 17 + nval])
                huff[tc_th] = _HuffDecoder(bits, values)
                off += 17 + nval
        elif marker == 0xDD:
            raise ValueError("restart intervals unsupported")
        elif marker == 0xDA:
            ns = seg[0]
            for ci in range(ns):
                _cid, tabs = seg[1 + 2 * ci : 3 + 2 * ci]
                scan_tabs.append((tabs >> 4, tabs & 0x0F))
            entropy = blob[pos:]
            break
    if h is None or entropy is None:
        raise ValueError("JPEG missing SOF0/SOS")

    br = _BitReader(entropy)
    ncomp = len(comps)
    hmax = max(c[2] for c in comps)
    vmax = max(c[3] for c in comps)
    for _, _, hi, vi in comps:
        if hmax % hi or vmax % vi:
            raise ValueError("non-integer JPEG sampling ratios unsupported")
    mcux, mcuy = -(-w // (8 * hmax)), -(-h // (8 * vmax))
    planes = [
        np.zeros((mcuy * vi * 8, mcux * hi * 8), dtype=np.float64)
        for _, _, hi, vi in comps
    ]
    prev = [0] * ncomp
    for my in range(mcuy):
        for mx in range(mcux):
            for ci, (_, qt, hi, vi) in enumerate(comps):
                dc_t, ac_t = scan_tabs[ci]
                dc = huff[0x00 | dc_t]
                ac = huff[0x10 | ac_t]
                for vy in range(vi):
                    for hx in range(hi):
                        zz = np.zeros(64, dtype=np.int32)
                        size = dc.decode(br)
                        prev[ci] += _extend(br.receive(size), size)
                        zz[0] = prev[ci]
                        k = 1
                        while k < 64:
                            rs = ac.decode(br)
                            run, size = rs >> 4, rs & 0x0F
                            if size == 0:
                                if run == 15:
                                    k += 16
                                    continue
                                break  # EOB
                            k += run
                            if k > 63:
                                raise ValueError("JPEG AC index overflow")
                            zz[k] = _extend(br.receive(size), size)
                            k += 1
                        coef = np.zeros(64, dtype=np.float64)
                        coef[_ZZ] = zz
                        block = coef.reshape(8, 8) * qtabs[qt]
                        pix = _C.T @ block @ _C + 128.0
                        py = (my * vi + vy) * 8
                        px = (mx * hi + hx) * 8
                        planes[ci][py : py + 8, px : px + 8] = pix

    # upsample subsampled planes by replication, then crop to (h, w)
    planes = [
        np.repeat(np.repeat(p, vmax // vi, axis=0), hmax // hi, axis=1)[:h, :w]
        for p, (_, _, hi, vi) in zip(planes, comps)
    ]
    if ncomp == 1:
        out = np.clip(np.round(planes[0]), 0, 255).astype(np.uint8)[:, :, None]
        return w, h, 1, out
    y, cb, cr = planes
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    out = np.clip(np.round(np.stack([r, g, b], axis=2)), 0, 255).astype(np.uint8)
    return w, h, 3, out
