"""Baseline JPEG (SOF0) decoder — pure Python/NumPy, no codec libs.

Closes the last image-decode stub (multimodal.py registered image/jpeg
without a decoder): baseline sequential DCT, 8-bit, grayscale or YCbCr
with any h/v sampling factors up to 2 (4:4:4, 4:2:2, 4:2:0), restart
markers, 8/16-bit quant tables. Progressive (SOF2), arithmetic coding,
and 12-bit precision raise ValueError — honestly refused, never
mis-decoded.

Scope note (scale honesty): the entropy decode is bit-serial Python —
correctness-grade for tests/fixtures, NOT the 100 TB hot path. In
production a native codec is dropped in via
`multimodal.register_image_decoder("image/jpeg", fn)`; the Spark-side
plumbing (pruned binaryFile scan -> mapInPandas feature kernel) is
identical either way, which is the part that must scale. The IDCT,
dequantize, upsample, and color-convert stages ARE vectorized NumPy.

Reference analog: UCSC-REAL/DS2 consumes pre-decoded pixel tensors
(score_curation/docta/datasets/cifar.py); decoding inside the engine is
this repo's extension for raw-corpus ingestion.
"""

from __future__ import annotations

import numpy as np

# JPEG zigzag scan order: zigzag index -> (row-major) block index
_ZIGZAG = np.array([
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
], dtype=np.int64)

# orthonormal 8x8 DCT matrix: spatial = M.T @ coeffs @ M
_M = np.array([
    [
        (np.sqrt(0.125) if u == 0 else 0.5)
        * np.cos((2 * x + 1) * u * np.pi / 16.0)
        for x in range(8)
    ]
    for u in range(8)
])


class _Huff:
    """Canonical Huffman table from DHT BITS/HUFFVAL, decoded with the
    standard mincode/maxcode length walk (ITU T.81 F.2.2.3)."""

    def __init__(self, bits: list[int], vals: bytes):
        self.maxcode = [-1] * 17
        self.mincode = [0] * 17
        self.valptr = [0] * 17
        self.vals = vals
        code, k = 0, 0
        for l in range(1, 17):
            if bits[l - 1]:
                self.valptr[l] = k
                self.mincode[l] = code
                code += bits[l - 1]
                k += bits[l - 1]
                self.maxcode[l] = code - 1
            code <<= 1


class _BitReader:
    """MSB-first bit reader over one entropy-coded segment (stuffing
    already removed)."""

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.bit = 0

    def read_bit(self) -> int:
        if self.pos >= len(self.data):
            return 0  # T.81: pad past the end with zero bits
        b = (self.data[self.pos] >> (7 - self.bit)) & 1
        self.bit += 1
        if self.bit == 8:
            self.bit = 0
            self.pos += 1
        return b

    def receive(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def decode_huff(self, t: _Huff) -> int:
        code = 0
        for l in range(1, 17):
            code = (code << 1) | self.read_bit()
            if t.maxcode[l] >= 0 and code <= t.maxcode[l]:
                return t.vals[t.valptr[l] + code - t.mincode[l]]
        raise ValueError("bad Huffman code")


def _extend(v: int, t: int) -> int:
    if t == 0:
        return 0
    return v if v >= (1 << (t - 1)) else v - (1 << t) + 1


def _split_entropy(b: bytes, pos: int) -> tuple[list[bytes], int]:
    """Entropy-coded data from `pos` to the next non-RST marker:
    un-stuffs 0xFF00 and splits at RST0-7. Returns (segments, end)."""
    segs, cur = [], bytearray()
    n = len(b)
    while pos < n:
        c = b[pos]
        if c != 0xFF:
            cur.append(c)
            pos += 1
            continue
        m = b[pos + 1] if pos + 1 < n else 0xD9
        if m == 0x00:
            cur.append(0xFF)
            pos += 2
        elif 0xD0 <= m <= 0xD7:
            segs.append(bytes(cur))
            cur = bytearray()
            pos += 2
        else:
            break  # real marker (EOI / next scan)
    segs.append(bytes(cur))
    return segs, pos


def decode_jpeg(b: bytes) -> np.ndarray:
    """Baseline JPEG bytes -> uint8 [h, w, 1] (grayscale) or
    [h, w, 3] (RGB via JFIF YCbCr)."""
    if len(b) < 4 or b[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG")
    qt: dict[int, np.ndarray] = {}
    hdc: dict[int, _Huff] = {}
    hac: dict[int, _Huff] = {}
    comps: list[dict] = []
    w = h = 0
    restart = 0
    pos = 2
    scan = None
    while pos + 4 <= len(b):
        if b[pos] != 0xFF:
            raise ValueError("marker expected")
        m = b[pos + 1]
        if m == 0xD9:  # EOI
            break
        ln = int.from_bytes(b[pos + 2 : pos + 4], "big")
        seg = b[pos + 4 : pos + 2 + ln]
        pos += 2 + ln
        if m == 0xC0 or m == 0xC1:  # SOF0/1 baseline/extended sequential
            if seg[0] != 8:
                raise ValueError("only 8-bit precision supported")
            h = int.from_bytes(seg[1:3], "big")
            w = int.from_bytes(seg[3:5], "big")
            nc = seg[5]
            comps = [
                {
                    "id": seg[6 + 3 * i],
                    "hs": seg[7 + 3 * i] >> 4,
                    "vs": seg[7 + 3 * i] & 15,
                    "tq": seg[8 + 3 * i],
                }
                for i in range(nc)
            ]
        elif m in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD,
                   0xCE, 0xCF):
            raise ValueError("progressive/arithmetic JPEG unsupported")
        elif m == 0xDB:  # DQT
            p = 0
            while p < len(seg):
                prec, tid = seg[p] >> 4, seg[p] & 15
                p += 1
                if prec:
                    tbl = np.frombuffer(seg[p : p + 128], dtype=">u2")
                    p += 128
                else:
                    tbl = np.frombuffer(seg[p : p + 64], dtype=np.uint8)
                    p += 64
                qt[tid] = tbl.astype(np.int32)
        elif m == 0xC4:  # DHT
            p = 0
            while p < len(seg):
                cls, tid = seg[p] >> 4, seg[p] & 15
                bits = list(seg[p + 1 : p + 17])
                nv = sum(bits)
                vals = seg[p + 17 : p + 17 + nv]
                (hac if cls else hdc)[tid] = _Huff(bits, vals)
                p += 17 + nv
        elif m == 0xDD:  # DRI
            restart = int.from_bytes(seg[0:2], "big")
        elif m == 0xDA:  # SOS
            ns = seg[0]
            sel = {
                seg[1 + 2 * i]: (seg[2 + 2 * i] >> 4, seg[2 + 2 * i] & 15)
                for i in range(ns)
            }
            segs, pos = _split_entropy(b, pos)
            scan = (sel, segs)
            break  # single-scan baseline
    if not comps or scan is None:
        raise ValueError("JPEG missing SOF/SOS")
    sel, segs = scan

    if w <= 0 or h <= 0:
        raise ValueError("bad dimensions")
    for c in comps:
        if not (1 <= c["hs"] <= 4 and 1 <= c["vs"] <= 4):
            raise ValueError("bad sampling factors")
    hmax = max(c["hs"] for c in comps)
    vmax = max(c["vs"] for c in comps)
    for c in comps:
        if hmax % c["hs"] or vmax % c["vs"]:
            raise ValueError("non-integer subsampling ratio unsupported")
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    for c in comps:
        bw, bh = mcux * c["hs"], mcuy * c["vs"]
        c["blocks"] = np.zeros((bh, bw, 64), dtype=np.int32)
        c["pred"] = 0

    seg_i = 0
    br = _BitReader(segs[0])
    n_mcu = mcux * mcuy
    for mi in range(n_mcu):
        if restart and mi and mi % restart == 0:
            seg_i += 1
            if seg_i >= len(segs):
                raise ValueError("missing restart segment")
            br = _BitReader(segs[seg_i])
            for c in comps:
                c["pred"] = 0
        my, mx = divmod(mi, mcux)
        for c in comps:
            if c["id"] not in sel:
                raise ValueError("component missing from scan")
            dct, act = sel[c["id"]]
            if dct not in hdc or act not in hac:
                raise ValueError("missing Huffman table")
            tdc, tac = hdc[dct], hac[act]
            for by in range(c["vs"]):
                for bx in range(c["hs"]):
                    coef = np.zeros(64, dtype=np.int32)
                    t = br.decode_huff(tdc)
                    diff = _extend(br.receive(t), t)
                    c["pred"] += diff
                    coef[0] = c["pred"]
                    k = 1
                    while k < 64:
                        rs = br.decode_huff(tac)
                        r, s = rs >> 4, rs & 15
                        if s == 0:
                            if r == 15:
                                k += 16
                                continue
                            break  # EOB
                        k += r
                        if k > 63:
                            raise ValueError("AC index overflow")
                        coef[k] = _extend(br.receive(s), s)
                        k += 1
                    c["blocks"][my * c["vs"] + by, mx * c["hs"] + bx] = coef

    # vectorized dequantize + dezigzag + IDCT per component
    planes = []
    for c in comps:
        bh, bw, _ = c["blocks"].shape
        q = qt.get(c["tq"])
        if q is None or len(q) != 64:
            raise ValueError("missing/short quant table")
        deq = c["blocks"] * q[None, None, :]
        full = np.zeros((bh, bw, 64), dtype=np.float64)
        full[:, :, _ZIGZAG] = deq
        blocks = full.reshape(bh, bw, 8, 8)
        # spatial[x,z] = sum_uv M[u,x] * F[u,v] * M[v,z]  (IDCT per block)
        spatial = np.einsum("ux,abuv,vz->abxz", _M, blocks, _M, optimize=True)
        img = spatial.transpose(0, 2, 1, 3).reshape(bh * 8, bw * 8) + 128.0
        # upsample to full MCU grid resolution
        ry, rx = vmax // c["vs"], hmax // c["hs"]
        if ry > 1 or rx > 1:
            img = np.repeat(np.repeat(img, ry, axis=0), rx, axis=1)
        planes.append(img[: mcuy * vmax * 8, : mcux * hmax * 8])

    if len(planes) == 1:
        out = np.clip(np.round(planes[0][:h, :w]), 0, 255).astype(np.uint8)
        return out[..., None]  # [h, w, 1], matching decode_png grayscale
    y, cb, cr = (p[:h, :w] for p in planes[:3])
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    bl = y + 1.772 * (cb - 128.0)
    rgb = np.stack([r, g, bl], axis=-1)
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)
