"""Baseline JPEG codec pins.

No third-party decoder exists in this container, so self-consistency
(encode→decode) alone could hide a matched pair of bugs. The decoder
is therefore ALSO pinned against HAND-CONSTRUCTED spec streams whose
correct pixels follow from closed-form arithmetic done outside the
codec: a DC-only block decodes to the constant
``round(clip(DC·Q[0]/8 + 128))`` (orthonormal IDCT of a lone [0,0]
coefficient), for both 4:4:4 and 4:2:0 sampling — any error in marker
parsing, Huffman decoding, DC prediction, dequantization, the IDCT or
the upsampler shifts those constants.
"""

from __future__ import annotations

import struct

import numpy as np
import pytest

from uofi_payroll_etl_main_demo_spark.ext.jpeg import (
    _AC_LUM,
    _DC_LUM,
    _build_huffman,
    decode_jpeg,
    jpeg_bytes,
)


class _BW:
    def __init__(self):
        self.bits: list[int] = []

    def put(self, code: int, length: int):
        for i in range(length - 1, -1, -1):
            self.bits.append((code >> i) & 1)

    def bytes(self) -> bytes:
        bits = self.bits + [1] * ((8 - len(self.bits) % 8) % 8)
        out = bytearray()
        for i in range(0, len(bits), 8):
            b = 0
            for j in range(8):
                b = (b << 1) | bits[i + j]
            out.append(b)
            if b == 0xFF:
                out.append(0x00)
        return bytes(out)


def _seg(marker: int, payload: bytes) -> bytes:
    return struct.pack(">HH", marker, len(payload) + 2) + payload


def _headers(w: int, h: int, comps: bytes, q: int) -> bytes:
    out = bytearray(b"\xff\xd8")
    out += _seg(0xFFDB, bytes([0]) + bytes([q] * 64))  # flat quant table
    out += _seg(
        0xFFC0, struct.pack(">BHHB", 8, h, w, len(comps) // 3) + comps
    )
    bits, vals = _DC_LUM
    out += _seg(0xFFC4, bytes([0x00]) + bytes(bits) + bytes(vals))
    bits, vals = _AC_LUM
    out += _seg(0xFFC4, bytes([0x10]) + bytes(bits) + bytes(vals))
    return bytes(out)


def _dc_block(bw: _BW, enc_dc: dict, enc_ac: dict, diff: int) -> None:
    cat = 0 if diff == 0 else abs(diff).bit_length()
    code, ln = enc_dc[cat]
    bw.put(code, ln)
    if cat:
        v = diff if diff > 0 else diff + (1 << cat) - 1
        bw.put(v, cat)
    code, ln = enc_ac[0x00]  # EOB
    bw.put(code, ln)


def test_hand_built_grayscale_dc_only():
    """One 8×8 grayscale block, quantized DC = 5, flat Q = 16: every
    pixel must be round(5·16/8 + 128) = 138 — arithmetic done here,
    not by the codec."""
    enc_dc, _ = _build_huffman(*_DC_LUM)
    enc_ac, _ = _build_huffman(*_AC_LUM)
    bw = _BW()
    _dc_block(bw, enc_dc, enc_ac, 5)
    stream = (
        _headers(8, 8, bytes([1, 0x11, 0]), 16)
        + _seg(0xFFDA, bytes([1, 1, 0x00, 0, 63, 0]))
        + bw.bytes()
        + b"\xff\xd9"
    )
    out = decode_jpeg(stream)
    assert out.shape == (8, 8, 3)
    assert (out == 138).all()


def test_hand_built_dc_prediction_chain():
    """Two horizontal blocks, DC diffs +5 then −3: second block's DC is
    2 → pixels 16·2/8 + 128 = 132; first stays 138. Any DC-predictor
    bug shifts the second block."""
    enc_dc, _ = _build_huffman(*_DC_LUM)
    enc_ac, _ = _build_huffman(*_AC_LUM)
    bw = _BW()
    _dc_block(bw, enc_dc, enc_ac, 5)
    _dc_block(bw, enc_dc, enc_ac, -3)
    stream = (
        _headers(16, 8, bytes([1, 0x11, 0]), 16)
        + _seg(0xFFDA, bytes([1, 1, 0x00, 0, 63, 0]))
        + bw.bytes()
        + b"\xff\xd9"
    )
    out = decode_jpeg(stream)
    assert (out[:, :8] == 138).all()
    assert (out[:, 8:] == 132).all()


def test_hand_built_420_sampling():
    """A 4:2:0 MCU (four Y blocks + one Cb + one Cr, all DC-only):
    Y = 138 everywhere, Cb DC −2 → Cb = 128 + (−2·16/8) = 124,
    Cr DC 0 → 128. BT.601: B = Y + 1.772(Cb−128) = 138 − 7.088 →
    round 131; R = 138; G = 138 − 0.344136·(−4) → round 139. The
    chroma plane is quarter-res, so the upsampler must spread one
    block over the whole 16×16 MCU."""
    enc_dc, _ = _build_huffman(*_DC_LUM)
    enc_ac, _ = _build_huffman(*_AC_LUM)
    bw = _BW()
    for _ in range(4):  # Y blocks: first diff 5, then 0,0,0
        _dc_block(bw, enc_dc, enc_ac, 5 if _ == 0 else 0)
    _dc_block(bw, enc_dc, enc_ac, -2)  # Cb
    _dc_block(bw, enc_dc, enc_ac, 0)  # Cr
    comps = bytes([1, 0x22, 0, 2, 0x11, 0, 3, 0x11, 0])
    stream = (
        _headers(16, 16, comps, 16)
        + _seg(0xFFDA, bytes([3, 1, 0x00, 2, 0x00, 3, 0x00, 0, 63, 0]))
        + bw.bytes()
        + b"\xff\xd9"
    )
    out = decode_jpeg(stream)
    assert out.shape == (16, 16, 3)
    assert (out[..., 0] == 138).all()  # R
    assert (out[..., 1] == 139).all()  # G
    assert (out[..., 2] == 131).all()  # B


def test_roundtrip_tolerance_and_dispatch():
    """Encode→decode error bounds (lossy, never bit-equal): flat color
    exact, smooth gradient within a few levels, noise bounded; JPEG
    payloads route through decode_image and the dHash of a q=95
    gradient stays within Hamming 2 of the lossless twin."""
    from uofi_payroll_etl_main_demo_spark.ext.multimodal import (
        decode_image,
    )

    flat = np.full((8, 8, 3), 77, dtype=np.uint8)
    assert (decode_image(jpeg_bytes(flat, quality=90)) == 77).all()
    r = np.arange(16).reshape(-1, 1)
    c = np.arange(18).reshape(1, -1)
    v = (3 + (5 * 37 + c * c * 11 + r * 7) % 237).astype(np.uint8)
    px = np.stack([v, v, v], axis=2)
    dec = decode_image(jpeg_bytes(px, quality=95))
    assert np.abs(dec.astype(int) - px.astype(int)).max() <= 8
    rng = np.random.default_rng(7)
    noisy = rng.integers(0, 256, (24, 31, 3), dtype=np.uint8)
    dec = decode_jpeg(jpeg_bytes(noisy, quality=90))
    assert dec.shape == noisy.shape
    assert np.abs(dec.astype(int) - noisy.astype(int)).mean() < 15


def test_jpeg_dhash_stability(spark):
    """Perceptual stability through the Spark path: JPEG re-encodes of
    the gradient fixtures hash within Hamming distance 2 of their
    lossless PPM twins (q=95) — lossy-but-perceptually-identical, the
    case dHash exists for."""
    from uofi_payroll_etl_main_demo_spark.ext.multimodal import (
        decode_ppm,
        image_dhash,
        synthetic_gradient_images,
    )

    media = synthetic_gradient_images(spark, n=6)
    rows = [
        (r["media_id"], jpeg_bytes(decode_ppm(bytes(r["payload"])), 95))
        for r in media.collect()
    ]
    jm = spark.createDataFrame(rows, "media_id bigint, payload binary")
    h0 = {r["media_id"]: r["dhash"] for r in image_dhash(media).collect()}
    h1 = {r["media_id"]: r["dhash"] for r in image_dhash(jm).collect()}
    for mid in h0:
        assert bin((h0[mid] ^ h1[mid]) & (2**64 - 1)).count("1") <= 2, mid


def test_corruption_and_stub_boundaries():
    px = (np.arange(8 * 8 * 3).reshape(8, 8, 3) % 256).astype(np.uint8)
    good = jpeg_bytes(px)
    with pytest.raises(Exception):
        decode_jpeg(good[: len(good) // 2])
    with pytest.raises(NotImplementedError):
        decode_jpeg(b"not a jpeg")
    # progressive (SOF2) is a principled stub
    prog = good.replace(b"\xff\xc0", b"\xff\xc2", 1)
    with pytest.raises(NotImplementedError):
        decode_jpeg(prog)


def test_jpeg_pairs_query_exact_twin_set(spark):
    """The registry query's pair set is EXACTLY the 24 (2g, 2g+1)
    twin pairs — the closed form its driver oracle asserts (r11: the
    row moved from rows-only to value-oracled on the separated
    fixture)."""
    from uofi_payroll_etl_main_demo_spark.queries import (
        q_image_dhash_jpeg_pairs,
    )

    pairs = {
        (r["id_a"], r["id_b"])
        for r in q_image_dhash_jpeg_pairs(spark, "unused").collect()
    }
    assert pairs == {(2 * g, 2 * g + 1) for g in range(24)}


def test_separated_jpeg_margins(spark):
    """Pin the margin arithmetic that makes ext_image_dhash_jpeg_pairs'
    closed-form oracle EXACT despite JPEG's lossiness: on the
    separated-pattern fixture, (a) q=95 quantization drifts each dHash
    <= 2 bits off its lossless value, (b) twins are losslessly
    identical, (c) cross-pattern lossless distances are >= 17 bits.
    Hence observed twin distance <= 4 <= threshold 6 and observed
    cross distance >= 13 > 6 — the pair set is exactly the twins."""
    import itertools

    from uofi_payroll_etl_main_demo_spark.ext.multimodal import (
        _separated_pixels,
        image_dhash,
        ppm_bytes,
        synthetic_separated_images_jpeg,
    )

    n = 48
    media = synthetic_separated_images_jpeg(spark, n=n)
    jh = {r["media_id"]: r["dhash"] for r in image_dhash(media).collect()}
    lossless_rows = [
        (i, ppm_bytes(_separated_pixels(i, 18, 16))) for i in range(n)
    ]
    lm = spark.createDataFrame(
        lossless_rows, "media_id bigint, payload binary"
    )
    lh = {r["media_id"]: r["dhash"] for r in image_dhash(lm).collect()}

    def ham(a, b):
        return bin((a ^ b) & (2**64 - 1)).count("1")

    assert max(ham(jh[i], lh[i]) for i in range(n)) <= 2  # (a)
    assert all(lh[2 * g] == lh[2 * g + 1] for g in range(n // 2))  # (b)
    cross = [
        ham(lh[a], lh[b])
        for a, b in itertools.combinations(range(n), 2)
        if a // 2 != b // 2
    ]
    assert min(cross) >= 17  # (c)


def test_hand_built_restart_interval():
    """DRI=1 with an RST0 marker between two grayscale blocks: the
    second block's DC PREDICTOR must reset (diff +5 after the restart
    means DC=5 → 138, not 10·16/8+128); bit alignment must resync at
    the marker. Exercises the restart path end-to-end."""
    enc_dc, _ = _build_huffman(*_DC_LUM)
    enc_ac, _ = _build_huffman(*_AC_LUM)
    bw1, bw2 = _BW(), _BW()
    _dc_block(bw1, enc_dc, enc_ac, 5)
    _dc_block(bw2, enc_dc, enc_ac, 5)  # same diff — but predictor reset
    stream = (
        _headers(16, 8, bytes([1, 0x11, 0]), 16)
        + _seg(0xFFDD, struct.pack(">H", 1))  # DRI: restart every MCU
        + _seg(0xFFDA, bytes([1, 1, 0x00, 0, 63, 0]))
        + bw1.bytes()
        + b"\xff\xd0"  # RST0
        + bw2.bytes()
        + b"\xff\xd9"
    )
    out = decode_jpeg(stream)
    assert (out[:, :8] == 138).all()
    assert (out[:, 8:] == 138).all()  # reset predictor: 138, NOT 148
