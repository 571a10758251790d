"""Baseline JPEG codec — stdlib + numpy only, public spec (ITU T.81).

Decoder: baseline sequential DCT (SOF0), 8-bit, 1 or 3 components,
4:4:4 and 4:2:0 sampling, standard or custom DQT/DHT, restart
intervals, 0xFF00 byte unstuffing, exact float IDCT (orthonormal
basis matmul), BT.601 YCbCr→RGB. Progressive (SOF2), arithmetic
coding and 12-bit variants raise the principled ``NotImplementedError``
— same stub contract as the other codecs; truncation raises
``ValueError`` so ``on_error="skip"`` can quarantine.

Encoder (fixture-side): 4:4:4 baseline with the Annex K quantization
tables (quality-scaled) and Annex K Huffman tables — enough to
round-trip any RGB array through REAL entropy-coded JPEG bytes for
tests and synthetic corpora. JPEG is LOSSY: roundtrips are pinned by
error tolerance (and by perceptual-hash stability), never bit
equality — which is exactly why the registry row for JPEG dedup is
rows-only with pytest golden pins instead of a closed-form SQL twin.

JPEG decode per image is pure CPU on an executor (the mapInPandas
batch contract is identical to PPM/PNG); a Python/numpy Huffman loop
is slow-but-real — the documented seam swaps in a native decoder
without touching any Spark plumbing.
"""

from __future__ import annotations

import struct

# ----------------------------------------------------------- tables --

# ITU T.81 Annex K.1 — luminance/chrominance quantization tables
_QT_LUM = [
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
]
_QT_CHR = [
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
]

# Annex K.3 — standard Huffman tables as (BITS[1..16], HUFFVAL)
_DC_LUM = (
    [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
    list(range(12)),
)
_DC_CHR = (
    [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
    list(range(12)),
)
_AC_LUM = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
    [
        0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
        0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
        0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
        0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
        0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
        0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
        0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
        0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
        0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
        0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
        0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
        0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
        0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
        0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7,
        0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
        0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
        0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4,
        0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
        0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA,
        0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
        0xF9, 0xFA,
    ],
)
_AC_CHR = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77],
    [
        0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21,
        0x31, 0x06, 0x12, 0x41, 0x51, 0x07, 0x61, 0x71,
        0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
        0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0,
        0x15, 0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34,
        0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
        0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38,
        0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48,
        0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
        0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68,
        0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
        0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
        0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96,
        0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
        0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
        0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3,
        0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2,
        0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
        0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9,
        0xEA, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
        0xF9, 0xFA,
    ],
)

_ZIGZAG = [
    0, 1, 8, 16, 9, 2, 3, 10,
    17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63,
]


def _dct_basis():
    import math

    import numpy as np

    A = np.empty((8, 8))
    for u in range(8):
        cu = math.sqrt(1 / 8) if u == 0 else math.sqrt(2 / 8)
        for x in range(8):
            A[u, x] = cu * math.cos((2 * x + 1) * u * math.pi / 16)
    return A


def _scaled_qt(base: list[int], quality: int):
    import numpy as np

    q = max(1, min(100, quality))
    scale = 5000 // q if q < 50 else 200 - 2 * q
    t = (np.array(base) * scale + 50) // 100
    return np.clip(t, 1, 255).astype(np.int32)


def _build_huffman(bits: list[int], vals: list[int]):
    """code → (length, value) maps from the (BITS, HUFFVAL) spec form:
    returns (encode: val → (code, length), decode: (length, code) → val)."""
    enc, dec = {}, {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            v = vals[k]
            enc[v] = (code, length)
            dec[(length, code)] = v
            code += 1
            k += 1
        code <<= 1
    return enc, dec


def _category(v: int) -> int:
    return 0 if v == 0 else abs(v).bit_length()


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            b = (self.acc >> (self.nbits - 8)) & 0xFF
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)  # byte stuffing
            self.nbits -= 8
        self.acc &= (1 << self.nbits) - 1

    def flush(self) -> None:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # pad with 1s


def jpeg_bytes(pixels, quality: int = 90) -> bytes:
    """Encode an (H, W, 3) uint8 RGB array as baseline 4:4:4 JPEG
    (Annex K quantization + Huffman tables). Fixture-side encoder —
    real entropy-coded bytes, standard-decoder compatible."""
    import numpy as np

    px = np.asarray(pixels, dtype=np.uint8)
    h, w, _ = px.shape
    A = _dct_basis()
    qt = [_scaled_qt(_QT_LUM, quality), _scaled_qt(_QT_CHR, quality)]

    # BT.601 RGB → YCbCr
    rgb = px.astype(np.float64)
    y = 0.299 * rgb[..., 0] + 0.587 * rgb[..., 1] + 0.114 * rgb[..., 2]
    cb = 128 - 0.168736 * rgb[..., 0] - 0.331264 * rgb[..., 1] + 0.5 * rgb[..., 2]
    cr = 128 + 0.5 * rgb[..., 0] - 0.418688 * rgb[..., 1] - 0.081312 * rgb[..., 2]

    bh, bw = (h + 7) // 8, (w + 7) // 8

    def pad(plane):
        out = np.empty((bh * 8, bw * 8))
        out[:h, :w] = plane
        out[h:, :w] = plane[h - 1 : h, :]  # edge-replicate
        out[:, w:] = out[:, w - 1 : w]
        return out

    planes = [pad(y), pad(cb), pad(cr)]
    enc_dc = [_build_huffman(*_DC_LUM)[0], _build_huffman(*_DC_CHR)[0]]
    enc_ac = [_build_huffman(*_AC_LUM)[0], _build_huffman(*_AC_CHR)[0]]

    bw_writer = _BitWriter()
    pred = [0, 0, 0]
    zz = np.array(_ZIGZAG)
    for by in range(bh):
        for bx in range(bw):
            for ci in range(3):
                t = 0 if ci == 0 else 1
                block = planes[ci][by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8]
                coef = A @ (block - 128.0) @ A.T
                q = np.round(coef / qt[t].reshape(8, 8)).astype(np.int64)
                seq = q.reshape(-1)[zz]
                diff = int(seq[0]) - pred[ci]
                pred[ci] = int(seq[0])
                cat = _category(diff)
                code, ln = enc_dc[t][cat]
                bw_writer.write(code, ln)
                if cat:
                    v = diff if diff > 0 else diff + (1 << cat) - 1
                    bw_writer.write(v, cat)
                run = 0
                last_nz = 0
                for i in range(1, 64):
                    if seq[i]:
                        last_nz = i
                for i in range(1, last_nz + 1):
                    v = int(seq[i])
                    if v == 0:
                        run += 1
                        continue
                    while run > 15:
                        code, ln = enc_ac[t][0xF0]  # ZRL
                        bw_writer.write(code, ln)
                        run -= 16
                    cat = _category(v)
                    code, ln = enc_ac[t][(run << 4) | cat]
                    bw_writer.write(code, ln)
                    vv = v if v > 0 else v + (1 << cat) - 1
                    bw_writer.write(vv, cat)
                    run = 0
                if last_nz < 63:
                    code, ln = enc_ac[t][0x00]  # EOB
                    bw_writer.write(code, ln)
    bw_writer.flush()

    def seg(marker: int, payload: bytes) -> bytes:
        return struct.pack(">HH", marker, len(payload) + 2) + payload

    out = bytearray(b"\xff\xd8")  # SOI
    out += seg(0xFFE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    for tid, t in enumerate(qt):
        zzt = bytes(int(t[i]) for i in _ZIGZAG)
        out += seg(0xFFDB, bytes([tid]) + zzt)
    out += seg(
        0xFFC0,
        struct.pack(">BHHB", 8, h, w, 3)
        + bytes([1, 0x11, 0, 2, 0x11, 1, 3, 0x11, 1]),
    )
    for cls, tid, (bits, vals) in (
        (0, 0, _DC_LUM), (1, 0, _AC_LUM), (0, 1, _DC_CHR), (1, 1, _AC_CHR),
    ):
        out += seg(
            0xFFC4, bytes([(cls << 4) | tid]) + bytes(bits) + bytes(vals)
        )
    out += seg(
        0xFFDA, bytes([3, 1, 0x00, 2, 0x11, 3, 0x11, 0, 63, 0])
    )
    out += bw_writer.out
    out += b"\xff\xd9"  # EOI
    return bytes(out)


class _BitReader:
    """Entropy-segment bit reader: unstuffs 0xFF00, stops AT restart/
    other markers (caller handles them)."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.acc = 0
        self.nbits = 0

    def _fill(self) -> None:
        d = self.data
        if self.pos >= len(d):
            raise ValueError("truncated JPEG entropy stream")
        b = d[self.pos]
        if b == 0xFF:
            if self.pos + 1 >= len(d):
                raise ValueError("truncated JPEG entropy stream")
            nxt = d[self.pos + 1]
            if nxt == 0x00:
                self.pos += 2
            else:
                # any marker here (incl. an unexpected restart — the
                # decoder resets at known MCU boundaries BEFORE reads)
                raise ValueError("unexpected marker inside entropy stream")
        else:
            self.pos += 1
        self.acc = (self.acc << 8) | b
        self.nbits += 8

    def bit(self) -> int:
        if not self.nbits:
            self._fill()
        self.nbits -= 1
        return (self.acc >> self.nbits) & 1

    def bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.bit()
        return v

    def align_and_skip_restart(self) -> None:
        self.acc = 0
        self.nbits = 0
        d = self.data
        # the restart marker itself sits at pos: FF Dn
        if self.pos + 1 < len(d) and d[self.pos] == 0xFF and 0xD0 <= d[self.pos + 1] <= 0xD7:
            self.pos += 2


def _decode_huff(br: _BitReader, dec: dict) -> int:
    code = 0
    for length in range(1, 17):
        code = (code << 1) | br.bit()
        if (length, code) in dec:
            return dec[(length, code)]
    raise ValueError("invalid JPEG Huffman code")


def _extend(v: int, cat: int) -> int:
    return v if v >= (1 << (cat - 1)) else v - (1 << cat) + 1


def decode_jpeg(payload: bytes):
    """(H, W, 3) uint8 from a baseline JPEG stream (see module doc)."""
    import numpy as np

    if not payload.startswith(b"\xff\xd8"):
        raise NotImplementedError("not a JPEG stream")
    pos = 2
    qts: dict[int, "np.ndarray"] = {}
    dc_tabs: dict[int, dict] = {}
    ac_tabs: dict[int, dict] = {}
    frame = None
    restart_interval = 0
    scan = None
    n = len(payload)
    while pos + 4 <= n:
        if payload[pos] != 0xFF:
            raise ValueError("JPEG marker desync")
        marker = struct.unpack_from(">H", payload, pos)[0]
        if marker == 0xFFD9:
            break
        length = struct.unpack_from(">H", payload, pos + 2)[0]
        body = payload[pos + 4 : pos + 2 + length]
        if len(body) != length - 2:
            raise ValueError("truncated JPEG segment")
        if marker == 0xFFDB:  # DQT
            i = 0
            while i < len(body):
                pq, tq = body[i] >> 4, body[i] & 0xF
                if pq != 0:
                    raise NotImplementedError("16-bit JPEG quant tables")
                t = np.empty(64, dtype=np.int32)
                for j in range(64):
                    t[_ZIGZAG[j]] = body[i + 1 + j]
                qts[tq] = t
                i += 65
        elif marker in (0xFFC1, 0xFFC2, 0xFFC3, 0xFFC5, 0xFFC6, 0xFFC7,
                        0xFFC9, 0xFFCA, 0xFFCB, 0xFFCD, 0xFFCE, 0xFFCF):
            raise NotImplementedError(
                "only baseline sequential JPEG (SOF0) is supported"
            )
        elif marker == 0xFFC0:  # SOF0
            prec, h, w, nc = struct.unpack_from(">BHHB", body, 0)
            if prec != 8:
                raise NotImplementedError("only 8-bit JPEG")
            comps = []
            for ci in range(nc):
                cid, hv, tq = body[6 + ci * 3 : 9 + ci * 3]
                comps.append(
                    {"id": cid, "h": hv >> 4, "v": hv & 0xF, "tq": tq}
                )
            frame = {"h": h, "w": w, "comps": comps}
        elif marker == 0xFFC4:  # DHT
            i = 0
            while i < len(body):
                tc, th = body[i] >> 4, body[i] & 0xF
                bits = list(body[i + 1 : i + 17])
                nv = sum(bits)
                vals = list(body[i + 17 : i + 17 + nv])
                _enc, dec = _build_huffman(bits, vals)
                (dc_tabs if tc == 0 else ac_tabs)[th] = dec
                i += 17 + nv
        elif marker == 0xFFDD:  # DRI
            restart_interval = struct.unpack_from(">H", body, 0)[0]
        elif marker == 0xFFDA:  # SOS
            ns = body[0]
            scan = []
            for si in range(ns):
                cs, tt = body[1 + si * 2 : 3 + si * 2]
                scan.append({"id": cs, "dc": tt >> 4, "ac": tt & 0xF})
            pos = pos + 2 + length
            break
        pos += 2 + length
    if frame is None or scan is None:
        raise ValueError("JPEG missing SOF0/SOS")

    comps = frame["comps"]
    by_id = {c["id"]: c for c in comps}
    for s in scan:
        by_id[s["id"]]["dc_t"] = s["dc"]
        by_id[s["id"]]["ac_t"] = s["ac"]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    if any(c["h"] not in (1, 2) or c["v"] not in (1, 2) for c in comps):
        raise NotImplementedError("JPEG sampling beyond 2×2 unsupported")
    h, w = frame["h"], frame["w"]
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)
    A = _dct_basis()
    planes = []
    for c in comps:
        pw, ph = mcux * c["h"] * 8, mcuy * c["v"] * 8
        planes.append(np.zeros((ph, pw)))

    br = _BitReader(payload, pos)
    pred = [0] * len(comps)
    zz = _ZIGZAG
    mcu_count = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                br.align_and_skip_restart()
                pred = [0] * len(comps)
            for ci, c in enumerate(comps):
                for vy in range(c["v"]):
                        for vx in range(c["h"]):
                            seq = np.zeros(64, dtype=np.int64)
                            cat = _decode_huff(br, dc_tabs[c["dc_t"]])
                            diff = _extend(br.bits(cat), cat) if cat else 0
                            pred[ci] += diff
                            seq[0] = pred[ci]
                            i = 1
                            while i < 64:
                                sym = _decode_huff(br, ac_tabs[c["ac_t"]])
                                if sym == 0x00:  # EOB
                                    break
                                run, size = sym >> 4, sym & 0xF
                                if size == 0:
                                    if run != 15:
                                        raise ValueError("bad JPEG AC symbol")
                                    i += 16
                                    continue
                                i += run
                                if i > 63:
                                    raise ValueError("JPEG AC overflow")
                                seq[i] = _extend(br.bits(size), size)
                                i += 1
                            blk = np.zeros(64, dtype=np.float64)
                            qtab = qts[c["tq"]]
                            for j in range(64):
                                blk[zz[j]] = seq[j] * qtab[zz[j]]
                            px_blk = A.T @ blk.reshape(8, 8) @ A + 128.0
                            y0 = (my * c["v"] + vy) * 8
                            x0 = (mx * c["h"] + vx) * 8
                            planes[ci][y0 : y0 + 8, x0 : x0 + 8] = px_blk
            mcu_count += 1

    # upsample subsampled components to full MCU-grid resolution
    full = []
    for ci, c in enumerate(comps):
        p = planes[ci]
        ry, rx = vmax // c["v"], hmax // c["h"]
        if ry > 1 or rx > 1:
            p = np.repeat(np.repeat(p, ry, axis=0), rx, axis=1)
        full.append(p[:h, :w])
    if len(comps) == 1:
        g = np.clip(np.round(full[0]), 0, 255).astype(np.uint8)
        return np.repeat(g[:, :, None], 3, axis=2)
    y, cb, cr = full[0], full[1], full[2]
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    rgb = np.stack([r, g, b], axis=2)
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)
