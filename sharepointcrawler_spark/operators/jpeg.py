"""Baseline JPEG codec — pure python/numpy (no PIL in the sandbox).

The third real codec after PNG and WAV (operators/multimodal.py): a
JFIF baseline sequential encoder/decoder pair implementing the actual
format — standard Annex-K quantization + Huffman tables, zigzag, DC
prediction, byte stuffing, 8x8 float DCT/IDCT — covering the shapes a
curation pipeline meets most: 8-bit baseline (SOF0) AND progressive
(SOF2: spectral selection + successive approximation, DC/AC refinement
scans, EOBRUN), 1 (grayscale) or 3 (YCbCr) components at 4:4:4, 4:2:2,
or the dominant real-photo 4:2:0 chroma subsampling (interleaved
multi-block MCUs; box downsample on encode, replication upsample on
decode), with DRI/RSTn restart intervals in baseline (the camera-JPEG
resilience feature: byte-aligned markers, DC predictor resets). Other
SOF types, progressive restart intervals, and malformed scan scripts
are detected and FLAGGED (ValueError), never silently mis-decoded,
matching the PNG/PDF strict-mode policy.

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


def _prep_planes(pixels: np.ndarray, quality: int, subsampling: str):
    """Shared encoder front half: color convert, MCU-pad, box-downsample
    chroma. Returns (gray, h, w, samp, mcux, mcuy, planes, qlum, qchrom)
    where planes is [(float plane, qtab, chroma_class)]."""
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
    return gray, h, w, samp, mcux, mcuy, planes, qlum, qchrom


def write_jpeg(
    pixels: np.ndarray,
    quality: int = 75,
    subsampling: str = "444",
    restart_interval: int = 0,
) -> bytes:
    """uint8 (h, w) grayscale or (h, w, 3) RGB -> baseline JFIF bytes
    with standard tables. ``subsampling``: "444" (no subsampling),
    "422" (chroma halved horizontally), or "420" (halved both ways —
    the dominant real-photo shape: 16x16-pixel MCUs of 4 Y blocks +
    1 Cb + 1 Cr). Chroma is box-downsampled (block mean), so flat
    chroma stays flat and the flat-block exactness anchor survives
    every mode. ``restart_interval`` > 0 emits a DRI segment and an
    RSTn marker (byte-aligned, DC predictors reset) every that many
    MCUs — the camera-JPEG resilience feature."""
    gray, h, w, samp, mcux, mcuy, planes, qlum, qchrom = _prep_planes(
        pixels, quality, subsampling
    )

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
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)
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
    for m in range(mcuy * mcux):
        if restart_interval and m and m % restart_interval == 0:
            # byte-align, emit RSTn (cycling 0..7), reset DC predictors
            bw.flush()
            bw.out += bytes([0xFF, 0xD0 + ((m // restart_interval - 1) % 8)])
            prev = [0] * len(planes)
        my, mx = divmod(m, mcux)
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


# a full-coverage canonical Huffman table for progressive AC scans:
# Annex-K AC tables lack the EOBn (n>=1) symbols progressive encoding
# needs, so the fixture encoder ships its own flat table — 255 symbols
# at 9 bits + symbol 255 at 10 (a DHT counts byte caps at 255).
_AC_FLAT = ([0, 0, 0, 0, 0, 0, 0, 0, 255, 1, 0, 0, 0, 0, 0, 0], list(range(256)))


def write_jpeg_progressive(
    pixels: np.ndarray, quality: int = 75, subsampling: str = "444"
) -> bytes:
    """uint8 grayscale/RGB -> PROGRESSIVE (SOF2) JFIF bytes: the same
    quantized coefficients as ``write_jpeg`` delivered as a scan script
    that exercises every progressive mechanism — interleaved DC first
    scan at Al=1, DC refinement, per-component AC spectral-selection
    first scans at Al=1 (EOBRUN spanning blocks), and AC successive-
    approximation refinement scans (correction bits + newly-significant
    placement, T.81 G.2 / the libjpeg encode_mcu_AC_refine procedure).
    Because progressive only reorders coefficient BITS, decode output
    is bit-identical to decoding the baseline encoding of the same
    image — the exactness anchor the tests and oracle lean on."""
    gray, h, w, samp, mcux, mcuy, planes, qlum, qchrom = _prep_planes(
        pixels, quality, subsampling
    )
    grids = [
        _block_grid(p, q, mcuy * samp[ci][1], mcux * samp[ci][0])
        for ci, (p, q, _) in enumerate(planes)
    ]
    ncomp = len(planes)

    out = bytearray(b"\xff\xd8")  # SOI
    out += b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
    for tid, q in ((0, qlum),) if gray else ((0, qlum), (1, qchrom)):
        out += b"\xff\xdb" + struct.pack(">H", 67) + bytes([tid])
        out += bytes(int(v) for v in q.flatten()[_ZZ])
    out += b"\xff\xc2" + struct.pack(">HBHHB", 8 + 3 * ncomp, 8, h, w, ncomp)
    for cid in range(1, ncomp + 1):
        hi, vi = samp[cid - 1]
        out += bytes([cid, (hi << 4) | vi, 0 if cid == 1 else 1])
    specs = [(0x00, _DC_LUM), (0x10, _AC_FLAT)]
    if not gray:
        specs += [(0x01, _DC_CHROM), (0x11, _AC_FLAT)]
    for tc_th, (bits, values) in specs:
        out += b"\xff\xc4" + struct.pack(">H", 19 + len(values)) + bytes([tc_th])
        out += bytes(bits) + bytes(values)

    dc_enc = {0: _HuffEncoder(_DC_LUM), 1: _HuffEncoder(_DC_CHROM)}
    ac_enc = _HuffEncoder(_AC_FLAT)

    def sos(scomps: list[int], ss: int, se: int, ah: int, al: int) -> bytes:
        seg = bytearray(b"\xff\xda" + struct.pack(">HB", 6 + 2 * len(scomps), len(scomps)))
        for ci in scomps:
            cls = planes[ci][2]
            seg += bytes([ci + 1, (cls << 4) | cls])
        seg += bytes([ss, se, (ah << 4) | al])
        return bytes(seg)

    al0 = 1  # one successive-approximation level

    # ---- scan 1: interleaved DC first (Al=al0)
    out += sos(list(range(ncomp)), 0, 0, 0, al0)
    bw = _BitWriter()
    prev = [0] * ncomp
    for my in range(mcuy):
        for mx in range(mcux):
            for ci in range(ncomp):
                hi, vi = samp[ci]
                enc = dc_enc[planes[ci][2]]
                for vy in range(vi):
                    for hx in range(hi):
                        v = int(grids[ci][my * vi + vy][mx * hi + hx][0]) >> al0
                        size, bits = _magnitude(v - prev[ci])
                        code, ln = enc.codes[size]
                        bw.write(code, ln)
                        if size:
                            bw.write(bits, size)
                        prev[ci] = v
    bw.flush()
    out += bw.out

    # ---- scan 2: interleaved DC refinement (Ah=al0, Al=0)
    out += sos(list(range(ncomp)), 0, 0, al0, 0)
    bw = _BitWriter()
    for my in range(mcuy):
        for mx in range(mcux):
            for ci in range(ncomp):
                hi, vi = samp[ci]
                for vy in range(vi):
                    for hx in range(hi):
                        bw.write(int(grids[ci][my * vi + vy][mx * hi + hx][0]) & 1, 1)
    bw.flush()
    out += bw.out

    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)

    def comp_blocks(ci: int):
        """Non-interleaved traversal: the component's own block grid."""
        hi, vi = samp[ci]
        cw = -(-(w * hi) // (8 * hmax))
        ch_ = -(-(h * vi) // (8 * vmax))
        for by in range(ch_):
            for bx in range(cw):
                yield grids[ci][by][bx]

    # ---- per component: AC first scan (Ss=1..63, Al=al0)
    for ci in range(ncomp):
        out += sos([ci], 1, 63, 0, al0)
        bw = _BitWriter()
        eobrun = 0

        def flush_eob():
            nonlocal eobrun
            if eobrun:
                nbits = eobrun.bit_length() - 1
                code, ln = ac_enc.codes[nbits << 4]
                bw.write(code, ln)
                if nbits:
                    bw.write(eobrun - (1 << nbits), nbits)
                eobrun = 0

        for zz in comp_blocks(ci):
            vals = [
                (int(v) >> al0) if v >= 0 else -((-int(v)) >> al0) for v in zz[1:64]
            ]
            last = max((i for i, v in enumerate(vals) if v), default=-1)
            if last < 0:
                eobrun += 1
                if eobrun == 0x7FFF:
                    flush_eob()
                continue
            flush_eob()
            r = 0
            for v in vals[: last + 1]:
                if v == 0:
                    r += 1
                    continue
                while r > 15:
                    code, ln = ac_enc.codes[0xF0]
                    bw.write(code, ln)
                    r -= 16
                size, bits = _magnitude(v)
                code, ln = ac_enc.codes[(r << 4) | size]
                bw.write(code, ln)
                bw.write(bits, size)
                r = 0
            if last < 62:
                eobrun += 1
                if eobrun == 0x7FFF:
                    flush_eob()
        flush_eob()
        bw.flush()
        out += bw.out

    # ---- per component: AC refinement scan (Ah=al0, Al=0)
    for ci in range(ncomp):
        out += sos([ci], 1, 63, al0, 0)
        bw = _BitWriter()
        eobrun = 0
        pending_bits: list[int] = []

        def flush_eob_refine():
            nonlocal eobrun, pending_bits
            if eobrun:
                nbits = eobrun.bit_length() - 1
                code, ln = ac_enc.codes[nbits << 4]
                bw.write(code, ln)
                if nbits:
                    bw.write(eobrun - (1 << nbits), nbits)
                eobrun = 0
            for b in pending_bits:
                bw.write(b, 1)
            pending_bits = []

        for zz in comp_blocks(ci):
            absv = [abs(int(v)) for v in zz[1:64]]
            signs = [0 if int(v) < 0 else 1 for v in zz[1:64]]
            eob = 0  # index AFTER the last newly-significant coefficient
            for i, a in enumerate(absv):
                if a == 1:
                    eob = i + 1
            r = 0
            br_bits: list[int] = []
            for i, a in enumerate(absv):
                if a == 0:
                    r += 1
                    continue
                while r > 15 and i < eob:
                    flush_eob_refine()
                    code, ln = ac_enc.codes[0xF0]
                    bw.write(code, ln)
                    r -= 16
                    for b in br_bits:
                        bw.write(b, 1)
                    br_bits = []
                if a > 1:
                    br_bits.append(a & 1)
                    continue
                flush_eob_refine()
                code, ln = ac_enc.codes[(r << 4) | 1]
                bw.write(code, ln)
                bw.write(signs[i], 1)
                for b in br_bits:
                    bw.write(b, 1)
                br_bits = []
                r = 0
            if r > 0 or br_bits:
                eobrun += 1
                pending_bits += br_bits
                if eobrun == 0x7FFF:
                    flush_eob_refine()
        flush_eob_refine()
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

    def sync_restart(self, n: int) -> None:
        """Byte-align and consume the expected RSTn marker (T.81
        E.2.4: restart markers cycle 0..7 in order)."""
        self.acc = 0
        self.nbits = 0
        if self.data[self.pos : self.pos + 2] != bytes([0xFF, 0xD0 + n]):
            raise ValueError(f"missing JPEG restart marker RST{n}")
        self.pos += 2


def _extend(v: int, size: int) -> int:
    return v if size == 0 or v >= (1 << (size - 1)) else v - (1 << size) + 1


def is_jpeg(blob: bytes | None) -> bool:
    return bool(blob) and blob[:3] == b"\xff\xd8\xff"


def decode_jpeg(blob: bytes) -> tuple[int, int, int, np.ndarray]:
    """JPEG bytes -> (width, height, channels, uint8 pixels (h, w, ch)).
    Baseline sequential (SOF0) AND progressive (SOF2: spectral
    selection, successive approximation, DC/AC refinement scans,
    EOBRUN), 8-bit, 1 or 3 components, any integer sampling factors
    whose ratios divide the maximum (covers 4:4:4, 4:2:2 and the
    dominant real-photo 4:2:0 shape; subsampled planes upsample by
    sample replication). Other SOF types and restart intervals raise
    ValueError (flag), never silently mis-decode."""
    if not is_jpeg(blob):
        raise ValueError("not a JPEG (bad signature)")
    pos = 2
    qtabs: dict[int, np.ndarray] = {}
    huff: dict[int, _HuffDecoder] = {}
    h = w = None
    comps: list[tuple[int, int, int, int]] = []  # (id, quant table, hi, vi)
    scan_tabs: list[tuple[int, int]] = []
    restart_interval = 0
    progressive = False
    # progressive: (scan comps [(idx, dc_t, ac_t)], ss, se, ah, al,
    # huff-table snapshot, entropy bytes) per SOS — tables may be
    # redefined between scans, so each scan records the dict in effect
    prog_scans: list[tuple] = []
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
        elif marker in (0xC1, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB):
            raise ValueError(f"non-baseline JPEG (SOF{marker - 0xC0}) unsupported")
        elif marker in (0xC0, 0xC2):
            progressive = marker == 0xC2
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
            (restart_interval,) = struct.unpack(">H", seg[:2])
        elif marker == 0xDA:
            ns = seg[0]
            if progressive:
                cid_index = {c[0]: i for i, c in enumerate(comps)}
                scomps = []
                for ci in range(ns):
                    cid, tabs = seg[1 + 2 * ci : 3 + 2 * ci]
                    scomps.append((cid_index[cid], tabs >> 4, tabs & 0x0F))
                ss, se, ahal = seg[1 + 2 * ns : 4 + 2 * ns]
                # entropy data runs to the next real marker (stuffed
                # 0xFF00 and RSTn bytes belong to the scan)
                end = pos
                while True:
                    end = blob.find(b"\xff", end)
                    if end < 0 or end + 1 >= len(blob):
                        end = len(blob)
                        break
                    nxt = blob[end + 1]
                    if nxt == 0x00 or 0xD0 <= nxt <= 0xD7:
                        end += 2
                        continue
                    break
                prog_scans.append(
                    (scomps, ss, se, ahal >> 4, ahal & 0x0F, dict(huff), blob[pos:end])
                )
                pos = end
            else:
                for ci in range(ns):
                    _cid, tabs = seg[1 + 2 * ci : 3 + 2 * ci]
                    scan_tabs.append((tabs >> 4, tabs & 0x0F))
                entropy = blob[pos:]
                break
    if h is None or (entropy is None and not prog_scans):
        raise ValueError("JPEG missing SOF/SOS")
    if progressive:
        if restart_interval:
            raise ValueError("restart intervals in progressive scans unsupported")
        return _finish_jpeg(
            _decode_progressive(blob, comps, qtabs, prog_scans, h, w), comps, h, w
        )

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
    for m in range(mcuy * mcux):
        if restart_interval and m and m % restart_interval == 0:
            br.sync_restart((m // restart_interval - 1) % 8)
            prev = [0] * ncomp
        my, mx = divmod(m, mcux)
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

    return _finish_jpeg(planes, comps, h, w)


def _finish_jpeg(
    planes: list, comps: list, h: int, w: int
) -> tuple[int, int, int, np.ndarray]:
    """Shared decode tail: upsample subsampled planes by replication,
    crop to (h, w), YCbCr -> RGB for 3 components."""
    hmax = max(c[2] for c in comps)
    vmax = max(c[3] for c in comps)
    planes = [
        np.repeat(np.repeat(p, vmax // vi, axis=0), hmax // hi, axis=1)[:h, :w]
        for p, (_, _, hi, vi) in zip(planes, comps)
    ]
    if len(comps) == 1:
        out = np.clip(np.round(planes[0]), 0, 255).astype(np.uint8)[:, :, None]
        return w, h, 1, out
    y, cb, cr = planes
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    out = np.clip(np.round(np.stack([r, g, b], axis=2)), 0, 255).astype(np.uint8)
    return w, h, 3, out


def _decode_progressive(
    blob: bytes, comps: list, qtabs: dict, scans: list, h: int, w: int
) -> list:
    """Progressive (SOF2) coefficient accumulation: every scan deposits
    its band/bit-plane into per-component zigzag coefficient arrays —
    DC first scans are diff-coded on the point-transformed value
    (``pred << Al``), DC refinement adds one bit per block, AC first
    scans run-length code a band with EOBRUN spanning blocks, AC
    refinement corrects nonzero-history coefficients bit-by-bit while
    placing newly significant ones (ITU-T T.81 G.2). After all scans,
    one vectorized dequantize + IDCT per component. The decoded pixels
    are BIT-IDENTICAL to baseline-decoding the same quantized
    coefficients (asserted by the progressive-vs-baseline equality
    test) — progressive is a bit reordering, not a different image."""
    hmax = max(c[2] for c in comps)
    vmax = max(c[3] for c in comps)
    for _, _, hi, vi in comps:
        if hmax % hi or vmax % vi:
            raise ValueError("non-integer JPEG sampling ratios unsupported")
    mcux, mcuy = -(-w // (8 * hmax)), -(-h // (8 * vmax))
    # zigzag coefficient store per component, MCU-padded block grid
    coefs = [
        np.zeros((mcuy * vi * 8 // 8, mcux * hi * 8 // 8, 64), dtype=np.int32)
        for _, _, hi, vi in comps
    ]
    preds = [0] * len(comps)

    for scomps, ss, se, ah, al, huffs, data in scans:
        br = _BitReader(data)
        eobrun = 0
        if ss == 0:
            if se != 0:
                # T.81 G.1.1.1.1: a progressive DC scan has Se=0; a
                # full-band Ss=0..Se=63 scan here means a mislabeled
                # sequential stream — flag, never desync-decode
                raise ValueError("progressive DC scan must have Se=0")
            for i, _, _ in scomps:
                preds[i] = 0
        if len(scomps) > 1:
            if ss != 0:
                raise ValueError("interleaved progressive AC scan is illegal")
            for my in range(mcuy):
                for mx in range(mcux):
                    for idx, dc_t, _ in scomps:
                        _, _, hi, vi = comps[idx]
                        dc = huffs.get(0x00 | dc_t)
                        for vy in range(vi):
                            for hx in range(hi):
                                block = coefs[idx][my * vi + vy, mx * hi + hx]
                                preds[idx] = _prog_dc(
                                    br, block, ah, al, dc, preds[idx]
                                )
        else:
            idx, dc_t, ac_t = scomps[0]
            _, _, hi, vi = comps[idx]
            # non-interleaved traversal: the component's OWN block grid
            # (ceil of its scaled dimensions, not the MCU-padded grid)
            cw = -(-(w * hi) // (8 * hmax))
            ch_ = -(-(h * vi) // (8 * vmax))
            for by in range(ch_):
                for bx in range(cw):
                    block = coefs[idx][by, bx]
                    if ss == 0:
                        preds[idx] = _prog_dc(
                            br, block, ah, al, huffs.get(0x00 | dc_t), preds[idx]
                        )
                    elif ah == 0:
                        eobrun = _prog_ac_first(
                            br, block, ss, se, al, huffs.get(0x10 | ac_t), eobrun
                        )
                    else:
                        eobrun = _prog_ac_refine(
                            br, block, ss, se, al, huffs.get(0x10 | ac_t), eobrun
                        )

    # vectorized dequantize + IDCT per component
    planes = []
    for (cid, qt, hi, vi), cf in zip(comps, coefs):
        bh, bw_ = cf.shape[0], cf.shape[1]
        deq = np.zeros((bh * bw_, 64), dtype=np.float64)
        deq[:, _ZZ] = cf.reshape(-1, 64)
        blocks = deq.reshape(-1, 8, 8) * qtabs[qt][None, :, :]
        pix = np.einsum("ij,njk,lk->nil", _C.T, blocks, _C.T) + 128.0
        plane = (
            pix.reshape(bh, bw_, 8, 8).transpose(0, 2, 1, 3).reshape(bh * 8, bw_ * 8)
        )
        planes.append(plane)
    return planes


def _prog_dc(br, block, ah: int, al: int, dc, pred: int) -> int:
    """DC portion of one block: first scan (Ah=0) diff-codes the
    point-transformed value; refinement adds bit Al."""
    if ah == 0:
        if dc is None:
            raise ValueError("JPEG scan references undefined DC Huffman table")
        size = dc.decode(br)
        pred += _extend(br.receive(size), size)
        block[0] = pred << al
    else:
        if br.bit():
            block[0] |= 1 << al
    return pred


def _prog_ac_first(br, block, ss: int, se: int, al: int, ac, eobrun: int) -> int:
    """AC first scan (Ah=0) for one block: run-length coefficients into
    the band, EOBn codes start an end-of-band run spanning blocks."""
    if ac is None:
        raise ValueError("JPEG scan references undefined AC Huffman table")
    if eobrun > 0:
        return eobrun - 1
    k = ss
    while k <= se:
        rs = ac.decode(br)
        r, s = rs >> 4, rs & 0x0F
        if s == 0:
            if r == 15:
                k += 16
                continue
            eobrun = 1 << r
            if r:
                eobrun += br.receive(r)
            return eobrun - 1
        k += r
        if k > se:
            raise ValueError("progressive AC index overflow")
        block[k] = _extend(br.receive(s), s) << al
        k += 1
    return 0


def _prog_ac_refine(br, block, ss: int, se: int, al: int, ac, eobrun: int) -> int:
    """AC refinement scan (Ah=Al+1) for one block: one correction bit
    per already-nonzero coefficient, (r,1) symbols place newly
    significant +-1<<Al coefficients after r zero-history positions;
    inside an EOB run only correction bits are read (T.81 G.2.2 /
    the libjpeg decode_mcu_AC_refine procedure)."""
    if ac is None:
        raise ValueError("JPEG scan references undefined AC Huffman table")
    p1 = 1 << al
    m1 = -1 << al

    def correct(k):
        if br.bit() and (abs(int(block[k])) & p1) == 0:
            block[k] += p1 if block[k] > 0 else m1

    k = ss
    if eobrun == 0:
        while k <= se:
            rs = ac.decode(br)
            r, s = rs >> 4, rs & 0x0F
            newval = 0
            if s == 0:
                if r < 15:
                    eobrun = 1 << r
                    if r:
                        eobrun += br.receive(r)
                    break
                # r == 15: ZRL — skip 16 zero-history positions
            else:
                if s != 1:
                    raise ValueError("invalid refinement magnitude")
                newval = p1 if br.bit() else m1
            while k <= se:
                if block[k] != 0:
                    correct(k)
                else:
                    if r == 0:
                        break
                    r -= 1
                k += 1
            if newval and k <= se:
                block[k] = newval
            k += 1
    if eobrun > 0:
        # finish this block: correction bits for remaining nonzeros
        while k <= se:
            if block[k] != 0:
                correct(k)
            k += 1
        eobrun -= 1
    return eobrun
