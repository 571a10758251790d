"""GIF87a codec pins.

Like the JPEG pins (tests/test_jpeg.py), self-consistency alone could
hide a matched encoder/decoder bug pair, so the decoder is ALSO pinned
against a HAND-PACKED spec stream whose LZW bytes were computed on
paper (codes [CLEAR,0,1,1,0,END] at min-code-size 2; the table reaches
8 entries after the third data code, so the final 0 and END are
4-bit codes; LSB-first packing → ``44 02 05``) — any error in
sub-block framing, bit unpacking, code widths, table growth or palette
lookup shifts those pixels. The LZW
state machine is additionally fuzzed round-trip across alphabet sizes
and stream lengths (including dictionary growth past a width bump and
the 4096-entry CLEAR reset) and through the KwKwK special case.
"""

from __future__ import annotations

import struct

import numpy as np
import pytest

from uofi_payroll_etl_main_demo_spark.ext.gif import (
    _lzw_decode,
    _lzw_encode,
    decode_gif,
    gif_bytes,
)
from uofi_payroll_etl_main_demo_spark.ext.multimodal import (
    _gradient_pixels,
    decode_image,
)


def _hand_gif(version=b"7a", extensions=b"", ipacked=0):
    """The paper-packed 2x2 checker GIF: palette {black, white}, LZW
    codes [CLEAR, 0, 1, 1, 0, END] at min code size 2 → bytes
    ``44 02 05`` (worked out by hand, LSB-first; the last data code
    and END are read at width 4 after the table hits 8 entries)."""
    return (
        b"GIF8" + version
        + struct.pack("<HH", 2, 2)
        + b"\x80\x00\x00"          # GCT present, 2 entries
        + b"\x00\x00\x00\xff\xff\xff"
        + extensions
        + b"\x2c" + struct.pack("<HHHH", 0, 0, 2, 2) + bytes([ipacked])
        + b"\x02"                  # min code size
        + b"\x03\x44\x02\x05"      # one 3-byte LZW sub-block
        + b"\x00\x3b"
    )


def test_hand_packed_spec_stream():
    px = decode_gif(_hand_gif())
    want = np.array(
        [[[0, 0, 0], [255, 255, 255]], [[255, 255, 255], [0, 0, 0]]],
        dtype=np.uint8,
    )
    assert (px == want).all()
    # 89a with a skipped graphic-control extension decodes identically
    ext = b"\x21\xf9\x04\x00\x00\x00\x00\x00"
    assert (decode_gif(_hand_gif(b"9a", extensions=ext)) == want).all()


def test_lzw_roundtrip_fuzz():
    rng = np.random.RandomState(7)
    for mcs in (2, 3, 5, 8):
        for n in (0, 1, 7, 255, 4096, 20000):
            idx = rng.randint(0, 1 << mcs, size=n)
            assert (_lzw_decode(_lzw_encode(idx, mcs), mcs, n) == idx).all()
    # KwKwK: runs of a single symbol force code == next-free-entry
    for n in (1, 2, 3, 10, 1000):
        idx = np.zeros(n, dtype=int)
        assert (_lzw_decode(_lzw_encode(idx, 2), 2, n) == idx).all()


def test_container_roundtrip_gradient_and_dispatch():
    for i in range(6):
        px = _gradient_pixels(i, 18, 16)
        payload = gif_bytes(px)
        assert (decode_gif(payload) == px).all()
        assert (decode_image(payload) == px).all()  # magic dispatch
    # large repetitive image crosses the 4096-entry reset path
    big = np.tile(np.arange(16, dtype=np.uint8).reshape(4, 4, 1), (40, 40, 3))
    assert (decode_gif(gif_bytes(big)) == big).all()
    # 250-color random image: full-width palette, incompressible content
    rng = np.random.RandomState(3)
    noise = np.repeat(rng.randint(0, 250, (64, 64, 1)), 3, axis=2).astype(
        np.uint8
    )
    assert (decode_gif(gif_bytes(noise)) == noise).all()


def test_guards_and_stub_boundaries():
    g = gif_bytes(_gradient_pixels(0, 18, 16))
    for cut in (5, 12, 40, len(g) // 2, len(g) - 2):
        with pytest.raises((ValueError, NotImplementedError)):
            decode_gif(g[:cut])
    with pytest.raises(ValueError):
        decode_gif(b"NOTAGIF" + g)
    with pytest.raises(NotImplementedError):
        decode_gif(_hand_gif(ipacked=0x40))  # interlaced
    with pytest.raises(NotImplementedError):
        decode_gif(_hand_gif(ipacked=0x80))  # local color table
    # >256 distinct colors exceed GIF's palette
    many = np.arange(27, dtype=np.uint8)
    grid = np.stack(np.meshgrid(many, many, many), -1).reshape(-1, 3)[:300]
    with pytest.raises(ValueError):
        gif_bytes(grid.reshape(30, 10, 3))
    # animation = a SECOND image block before the trailer: must hit
    # the stub boundary, not silently decode frame 1 (two different
    # animations sharing frame 1 would dedup as identical)
    one = _hand_gif()
    body, frame = one[:-1], b"\x2c" + one[one.index(b"\x2c") + 1 :]
    with pytest.raises(NotImplementedError):
        decode_gif(body + frame)
    # trailing garbage instead of a trailer stays loud
    with pytest.raises(ValueError):
        decode_gif(one[:-1] + b"\x07")
    with pytest.raises(ValueError):
        decode_gif(one[:-1])  # sub-blocks end but no trailer byte
    # LZW min code size has a spec ceiling of 8 (palette indices are
    # bytes); 9 must be a clear ValueError, not a table-build crash
    bad = bytearray(one)
    bad[one.index(b"\x2c") + 10] = 9
    with pytest.raises(ValueError, match="min code size"):
        decode_gif(bytes(bad))


def test_gif_fixture_hashes_match_ppm_twin(spark):
    """Lossless codec twins must agree bit-for-bit: the GIF gradient
    corpus produces the exact dHash set of the PPM corpus."""
    from uofi_payroll_etl_main_demo_spark.ext.multimodal import (
        image_dhash,
        synthetic_gradient_images,
        synthetic_gradient_images_gif,
    )

    ppm = {
        r["media_id"]: r["dhash"]
        for r in image_dhash(synthetic_gradient_images(spark, n=16)).collect()
    }
    gif = {
        r["media_id"]: r["dhash"]
        for r in image_dhash(
            synthetic_gradient_images_gif(spark, n=16)
        ).collect()
    }
    assert gif == ppm
