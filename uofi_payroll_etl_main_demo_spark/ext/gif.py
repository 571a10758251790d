"""GIF87a codec — pure stdlib+numpy, from the public GIF specification.

The fourth REAL image codec beside PPM/PNG/BMP/JPEG: palette-indexed
pixels under variable-width LZW. The decoder implements the full GIF
LZW state machine — variable code width (3..12 bits), CLEAR/END codes,
dictionary growth with the 4096-entry cap, and the KwKwK
(code == next-free-entry) special case; the encoder is a genuine
dictionary LZW compressor (not the fixed-width "uncompressed GIF"
trick), so round-tripping a fixture exercises the decoder's growth
path for real. Animated/interlaced/local-palette streams raise
``NotImplementedError`` at the decode site (the documented stub
boundary); structural corruption raises ``ValueError``.

Like the sibling codecs (multimodal.py decode_png/decode_bmp,
jpeg.py), this exists so the multimodal pipeline's decode seam is real:
``decode_image`` dispatches on the ``GIF8`` magic and every
dHash/resize/quarantine path lights up unchanged.
"""

from __future__ import annotations

import struct


def _lzw_encode(indices, min_code_size: int) -> bytes:
    """Variable-width LZW over palette indices (GIF flavor: emits an
    initial CLEAR, grows code width at table size 2^width, resets via
    CLEAR at the 4096 cap, ends with END)."""
    clear = 1 << min_code_size
    end = clear + 1
    out_bits: list[int] = []  # (value, width) packed little-endian

    def emit(code: int, width: int) -> None:
        out_bits.append((code, width))

    table = {(i,): i for i in range(clear)}
    next_code = end + 1
    width = min_code_size + 1
    emit(clear, width)
    buf: tuple[int, ...] = ()
    for sym in indices:
        sym = int(sym)
        cand = buf + (sym,)
        if cand in table:
            buf = cand
            continue
        emit(table[buf], width)
        table[cand] = next_code
        next_code += 1
        if next_code > (1 << width) and width < 12:
            width += 1
        elif next_code >= 4096:
            emit(clear, width)
            table = {(i,): i for i in range(clear)}
            next_code = end + 1
            width = min_code_size + 1
        buf = (sym,)
    if buf:
        emit(table[buf], width)
    emit(end, width)

    # pack LSB-first
    acc = nbits = 0
    data = bytearray()
    for code, w in out_bits:
        acc |= code << nbits
        nbits += w
        while nbits >= 8:
            data.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8
    if nbits:
        data.append(acc & 0xFF)
    return bytes(data)


def _lzw_decode(data: bytes, min_code_size: int, n_pixels: int):
    """Inverse of :func:`_lzw_encode` — the full GIF LZW state machine
    including the KwKwK case. Returns exactly ``n_pixels`` indices;
    a stream that ends early raises ``ValueError``."""
    import numpy as np

    clear = 1 << min_code_size
    end = clear + 1
    out = np.empty(n_pixels, dtype=np.uint8)
    n_out = 0
    table: list[bytes] = [bytes([i]) for i in range(clear)] + [b"", b""]
    width = min_code_size + 1
    prev: bytes | None = None

    acc = nbits = pos = 0
    total = len(data)
    while True:
        while nbits < width:
            if pos >= total:
                raise ValueError("LZW stream ended without END code")
            acc |= data[pos] << nbits
            pos += 1
            nbits += 8
        code = acc & ((1 << width) - 1)
        acc >>= width
        nbits -= width
        if code == clear:
            table = [bytes([i]) for i in range(clear)] + [b"", b""]
            width = min_code_size + 1
            prev = None
            continue
        if code == end:
            break
        if prev is None:
            if code >= len(table):
                raise ValueError("first LZW code not in table")
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            table.append(prev + entry[:1])
        elif code == len(table):  # KwKwK
            entry = prev + prev[:1]
            table.append(entry)
        else:
            raise ValueError("LZW code beyond table")
        if n_out + len(entry) > n_pixels:
            raise ValueError("LZW stream overruns pixel count")
        out[n_out : n_out + len(entry)] = bytearray(entry)
        n_out += len(entry)
        if len(table) >= (1 << width) and width < 12:
            width += 1
        prev = entry
    if n_out != n_pixels:
        raise ValueError(f"LZW stream produced {n_out}/{n_pixels} pixels")
    return out


def gif_bytes(pixels) -> bytes:
    """Encode an (H, W, 3) uint8 array as a single-frame GIF87a with a
    global palette (distinct colors must fit GIF's 256-entry table —
    more raises ``ValueError``; quantization is out of scope for a
    fixture encoder)."""
    import numpy as np

    px = np.asarray(pixels, dtype=np.uint8)
    h, w, _ = px.shape
    flat = px.reshape(-1, 3)
    palette, inverse = np.unique(flat, axis=0, return_inverse=True)
    n_colors = len(palette)
    if n_colors > 256:
        raise ValueError(f"{n_colors} distinct colors exceed GIF's 256")
    # palette size must be a power of two >= 2
    size_exp = max(1, int(n_colors - 1).bit_length())
    table = np.zeros((1 << size_exp, 3), dtype=np.uint8)
    table[:n_colors] = palette
    min_code_size = max(2, size_exp)  # spec floor: 2

    out = bytearray(b"GIF87a")
    out += struct.pack("<HH", w, h)
    out.append(0x80 | ((size_exp - 1) & 0x07))  # GCT flag + size
    out += b"\x00\x00"  # bg color, aspect
    out += table.tobytes()
    out += b"\x2c" + struct.pack("<HHHH", 0, 0, w, h) + b"\x00"
    out.append(min_code_size)
    lzw = _lzw_encode(inverse, min_code_size)
    for i in range(0, len(lzw), 255):
        block = lzw[i : i + 255]
        out.append(len(block))
        out += block
    out += b"\x00\x3b"  # sub-block terminator + trailer
    return bytes(out)


def _skip_extension(payload: bytes, i: int) -> int:
    """Advance past one extension block (label + data sub-blocks);
    ``i`` points just after the 0x21 introducer. One copy of the
    sub-block walk for both the pre-image and post-image scans."""
    if i >= len(payload):
        raise ValueError("truncated extension")
    i += 1  # label
    while True:
        if i >= len(payload):
            raise ValueError("truncated extension sub-block")
        n = payload[i]
        i += 1 + n
        if n == 0:
            return i


def decode_gif(payload: bytes):
    """(H, W, 3) uint8 array from a single-frame GIF87a/89a stream.
    Interlaced images, local color tables and multi-frame animations
    raise ``NotImplementedError`` (stub boundary); truncation and
    malformed LZW raise ``ValueError``."""
    import numpy as np

    if len(payload) < 13 or payload[:4] != b"GIF8" or payload[4:6] not in (
        b"7a",
        b"9a",
    ):
        raise ValueError("not a GIF stream")
    sw, sh = struct.unpack("<HH", payload[6:10])
    packed = payload[10]
    i = 13
    gct = None
    if packed & 0x80:
        n = 2 << (packed & 0x07)
        if i + 3 * n > len(payload):
            raise ValueError("truncated global color table")
        gct = np.frombuffer(payload, np.uint8, 3 * n, i).reshape(n, 3)
        i += 3 * n
    while True:
        if i >= len(payload):
            raise ValueError("GIF stream ended without trailer")
        block = payload[i]
        i += 1
        if block == 0x3B:  # trailer before any image
            raise ValueError("GIF has no image data")
        if block == 0x21:  # extension: skip sub-blocks
            i = _skip_extension(payload, i)
            continue
        if block == 0x2C:
            break
        raise ValueError(f"unknown GIF block 0x{block:02x}")
    if i + 9 > len(payload):
        raise ValueError("truncated image descriptor")
    left, top, w, h = struct.unpack("<HHHH", payload[i : i + 8])
    ipacked = payload[i + 8]
    i += 9
    if ipacked & 0x40:
        raise NotImplementedError("interlaced GIF unsupported")
    if ipacked & 0x80:
        raise NotImplementedError("local color table unsupported")
    if gct is None:
        raise ValueError("GIF image without any color table")
    if (left, top, w, h) != (0, 0, sw, sh):
        raise NotImplementedError("partial-canvas GIF frame unsupported")
    if i >= len(payload):
        raise ValueError("truncated before LZW min code size")
    min_code_size = payload[i]
    i += 1
    # spec ceiling is 8: palette indices never exceed 255, and 9+
    # would make _lzw_decode build root entries > 0xFF
    if not 2 <= min_code_size <= 8:
        raise ValueError(f"bad LZW min code size {min_code_size}")
    chunks = []
    while True:
        if i >= len(payload):
            raise ValueError("truncated LZW sub-blocks")
        n = payload[i]
        i += 1
        if n == 0:
            break
        if i + n > len(payload):
            raise ValueError("truncated LZW sub-block")
        chunks.append(payload[i : i + n])
        i += n
    idx = _lzw_decode(b"".join(chunks), min_code_size, w * h)
    if (idx >= len(gct)).any():
        raise ValueError("palette index beyond color table")
    # walk the remaining blocks: a second image separator means an
    # ANIMATION, which must hit the documented stub boundary — not
    # silently hash as its first frame (two different animations
    # sharing frame 1 would dedup as identical)
    while True:
        if i >= len(payload):
            raise ValueError("GIF stream ended without trailer")
        block = payload[i]
        i += 1
        if block == 0x3B:
            break
        if block == 0x2C:
            raise NotImplementedError("multi-frame animated GIF unsupported")
        if block == 0x21:
            i = _skip_extension(payload, i)
            continue
        raise ValueError(f"unknown GIF block 0x{block:02x}")
    return gct[idx].reshape(h, w, 3)
