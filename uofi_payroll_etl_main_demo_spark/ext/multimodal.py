"""Multimodal column plumbing: binary payloads + typed metadata.

Design: image/audio/video payloads are opaque ``binary`` columns with a
typed metadata struct alongside (modality, mime, width/height or
duration, sample_rate). All Spark-side plumbing — schema, partitioning,
Arrow batch shape through ``mapInPandas`` — is real and tested; the
actual media DECODE is stubbed because codec libraries (PIL/ffmpeg/
torchaudio) are not in this container:

- ``decode_stub=True`` (default): a deterministic fake decoder — byte
  statistics standing in for pixels/samples — so the distributed
  plumbing can be exercised end-to-end.
- ``decode_stub=False``: raises NotImplementedError at the decode site,
  marking exactly where a real codec plugs in.

The batch contract is the part that matters at 100 TB: payloads never
pass through the driver, flow executor-side through Arrow record
batches, and ``spark.sql.execution.arrow.maxRecordsPerBatch`` bounds
batch memory (media rows are large — size it small for real media).
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_META = T.StructType(
    [
        T.StructField("modality", T.StringType()),  # image|audio|video
        T.StructField("mime", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("duration_ms", T.IntegerType()),
        T.StructField("sample_rate", T.IntegerType()),
    ]
)

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("payload", T.BinaryType()),
        T.StructField("meta", MEDIA_META),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("byte_mean", T.DoubleType()),
        T.StructField("byte_std", T.DoubleType()),
        T.StructField("feature", T.ArrayType(T.FloatType())),
    ]
)


def synthetic_media(spark, n: int = 64, payload_bytes: int = 256) -> DataFrame:
    """Deterministic fake media table matching MEDIA_SCHEMA (for tests)."""
    rows = []
    for i in range(n):
        payload = bytes(((i * 31 + j * 7) % 251) for j in range(payload_bytes))
        rows.append(
            (
                i,
                payload,
                {
                    "modality": ["image", "audio", "video"][i % 3],
                    "mime": ["image/png", "audio/wav", "video/mp4"][i % 3],
                    "width": 64 if i % 3 == 0 else None,
                    "height": 64 if i % 3 == 0 else None,
                    "duration_ms": 1000 * (i % 10) if i % 3 else None,
                    "sample_rate": 16000 if i % 3 == 1 else None,
                },
            )
        )
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def extract_features(
    media: DataFrame, feature_dim: int = 8, decode_stub: bool = True
) -> DataFrame:
    """Decode + feature-extract via ``mapInPandas`` (Arrow batches).

    Real plumbing, stubbed decode: with ``decode_stub`` the "feature"
    is a deterministic byte-histogram projection; without it the decode
    site raises NotImplementedError (plug a real codec there).
    """

    def batches(it: Iterator) -> Iterator:
        import numpy as np
        import pandas as pd

        for pdf in it:
            if not decode_stub:
                raise NotImplementedError(
                    "real media decode requires codec libraries (PIL/ffmpeg); "
                    "install them and replace this branch"
                )
            out = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                if payload is None:
                    out.append((mid, 0, None, None, None))
                    continue
                arr = np.frombuffer(payload, dtype=np.uint8)
                hist = np.histogram(arr, bins=feature_dim, range=(0, 256))[0]
                denom = max(arr.size, 1)
                out.append(
                    (
                        mid,
                        int(arr.size),
                        float(arr.mean()),
                        float(arr.std()),
                        (hist / denom).astype("float32").tolist(),
                    )
                )
            yield pd.DataFrame(
                out,
                columns=["media_id", "n_bytes", "byte_mean", "byte_std", "feature"],
            )

    return media.mapInPandas(batches, FEATURE_SCHEMA)


def frame_sample_plan(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling PLAN: one output row per planned frame.

    Pure relational expansion (sequence + explode on duration metadata)
    — the decode of each planned frame would run in ``extract_features``.
    Demonstrates the explode-side shape: partition count scales with
    frames, not videos, so one long video cannot hot-spot a task.
    """
    return (
        media.filter(F.col("meta.modality") == "video")
        .select(
            "media_id",
            F.explode(
                F.sequence(
                    F.lit(0),
                    F.greatest(F.coalesce(F.col("meta.duration_ms"), F.lit(0)) - 1, F.lit(0)),
                    F.lit(every_ms),
                )
            ).alias("frame_ms"),
        )
    )


# ---------------------------------------------------------------------------
# Real decoders for container-friendly formats.
#
# PCM WAV and binary PPM need NOTHING beyond the stdlib + numpy: WAV is
# a RIFF header over raw little-endian PCM frames; P6 PPM is an ASCII
# header over raw RGB bytes. Implementing them upgrades the engine's
# multimodal story from "stub only" to "real decode where no codec
# library is required, stub where one is" — the mapInPandas batch
# contract is identical either way, so a PIL/ffmpeg-backed decoder
# slots into the same seam.
# ---------------------------------------------------------------------------

AUDIO_FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("n_samples", T.LongType()),
        T.StructField("sample_rate", T.IntegerType()),
        T.StructField("duration_ms", T.DoubleType()),
        T.StructField("rms", T.DoubleType()),
        T.StructField("zero_cross_rate", T.DoubleType()),
        T.StructField("spectral_centroid_hz", T.DoubleType()),
    ]
)

IMAGE_FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("mean_r", T.DoubleType()),
        T.StructField("mean_g", T.DoubleType()),
        T.StructField("mean_b", T.DoubleType()),
        T.StructField("thumb4", T.ArrayType(T.FloatType())),
    ]
)


def wav_bytes(samples, sample_rate: int = 16000) -> bytes:
    """Encode a float array in [-1, 1] as 16-bit mono PCM WAV (stdlib)."""
    import io
    import wave

    import numpy as np

    pcm = (np.clip(np.asarray(samples), -1.0, 1.0) * 32767.0).astype("<i2")
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sample_rate)
        w.writeframes(pcm.tobytes())
    return buf.getvalue()


def ppm_bytes(pixels) -> bytes:
    """Encode an (H, W, 3) uint8 array as binary P6 PPM."""
    import numpy as np

    px = np.asarray(pixels, dtype=np.uint8)
    h, w, _ = px.shape
    return b"P6\n%d %d\n255\n" % (w, h) + px.tobytes()


def decode_wav(payload: bytes):
    """(samples float64 in [-1,1], sample_rate) from 16-bit PCM WAV."""
    import io
    import wave

    import numpy as np

    with wave.open(io.BytesIO(payload), "rb") as w:
        if w.getsampwidth() != 2:
            raise NotImplementedError("only 16-bit PCM WAV is supported")
        sr = w.getframerate()
        raw = w.readframes(w.getnframes())
        ch = w.getnchannels()
    x = np.frombuffer(raw, dtype="<i2").astype(np.float64) / 32767.0
    if ch > 1:  # downmix interleaved channels
        x = x.reshape(-1, ch).mean(axis=1)
    return x, sr


def mulaw_compress(pcm):
    """G.711 mu-law compress int16 linear samples → uint8 codewords
    (ITU-T G.711 / the public-domain Sun ``g711.c`` algorithm:
    bias 0x84, clip 32635, segment = bit-length(biased) - 8, 4-bit
    mantissa, ones-complement output). Vectorized: the segment comes
    from ``np.frexp``'s exponent, which IS the bit length for positive
    ints, so no log2 float-boundary risk."""
    import numpy as np

    k = np.asarray(pcm, dtype=np.int64)
    sign = np.where(k < 0, 0x80, 0)
    x = np.minimum(np.abs(k), 32635) + 0x84
    exp = np.frexp(x.astype(np.float64))[1] - 8  # bit_length(x) - 8, in [0, 7]
    mant = (x >> (exp + 3)) & 0x0F
    return (~(sign | (exp << 4) | mant) & 0xFF).astype(np.uint8)


def mulaw_expand(codes):
    """G.711 mu-law expand uint8 codewords → int16-range linear
    samples (exact integers; max magnitude 32124). Inverse of
    :func:`mulaw_compress` on codewords: ``compress(expand(b)) == b``
    for every byte, pinned in tests."""
    import numpy as np

    u = (~np.asarray(codes, dtype=np.int64)) & 0xFF
    sign = u & 0x80
    exp = (u >> 4) & 0x07
    mant = u & 0x0F
    y = (((mant << 3) + 0x84) << exp) - 0x84
    return np.where(sign != 0, -y, y)


def alaw_compress(pcm):
    """G.711 A-law compress int16 linear samples → uint8 codewords
    (ITU-T G.711 / the public-domain Sun ``g711.c`` ``linear2alaw``:
    >>3 to 13-bit, negatives fold as ``-m - 1``, 8-entry segment
    table, 4-bit mantissa, even-bit inversion mask 0x55/0xD5).
    Vectorized with ``np.searchsorted`` over the segment-end table."""
    import numpy as np

    k = np.asarray(pcm, dtype=np.int64)
    m = k >> 3
    mask = np.where(m >= 0, 0xD5, 0x55)
    v = np.where(m >= 0, m, -m - 1)
    aend = np.array([0x1F, 0x3F, 0x7F, 0xFF, 0x1FF, 0x3FF, 0x7FF, 0xFFF])
    seg = np.searchsorted(aend, v, side="left")
    shift = np.where(seg < 2, 1, seg)
    aval = (np.minimum(seg, 7) << 4) | ((v >> shift) & 0x0F)
    return ((np.where(seg >= 8, 0x7F, aval) ^ mask) & 0xFF).astype(np.uint8)


def alaw_expand(codes):
    """G.711 A-law expand uint8 codewords → int16-range linear samples
    (exact integers; max magnitude 32256). Inverse of
    :func:`alaw_compress` on codewords: ``compress(expand(b)) == b``
    for every byte, pinned in tests. Sign convention per ``g711.c``:
    bit 0x80 of the 0x55-unmasked value set means POSITIVE."""
    import numpy as np

    a = (np.asarray(codes, dtype=np.int64) ^ 0x55) & 0xFF
    seg = (a >> 4) & 0x07
    t = ((a & 0x0F) << 4) + np.where(seg == 0, 8, 0x108)
    t = np.where(seg > 1, t << np.maximum(seg - 1, 0), t)
    return np.where((a & 0x80) != 0, t, -t)


def mulaw_wav_bytes(pcm, sample_rate: int = 8000) -> bytes:
    """Encode int16 linear samples as a mono G.711 mu-law WAV
    (RIFF format code 7, 8 bits/sample, 18-byte fmt chunk with
    ``cbSize = 0`` as non-PCM WAVE requires). The stdlib ``wave``
    module writes PCM only, so the container is assembled directly
    from the public RIFF/WAVE layout."""
    import struct

    data = mulaw_compress(pcm).tobytes()
    fmt = struct.pack(
        "<HHIIHHH", 7, 1, sample_rate, sample_rate * 1, 1, 8, 0
    )
    body = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
        + (b"\x00" if len(data) % 2 else b"")
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body


# IMA/DVI ADPCM tables — public spec (IMA Recommended Practices for
# Enhancing Digital Audio Compatibility, 1992; also RFC 3551 DVI4).
_IMA_STEP_TABLE = (
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31, 34,
    37, 41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143,
    157, 173, 190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494,
    544, 598, 658, 724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552,
    1707, 1878, 2066, 2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428,
    4871, 5358, 5894, 6484, 7132, 7845, 8630, 9493, 10442, 11487,
    12635, 13899, 15289, 16818, 18500, 20350, 22385, 24623, 27086,
    29794, 32767,
)
_IMA_INDEX_TABLE = (-1, -1, -1, -1, 2, 4, 6, 8, -1, -1, -1, -1, 2, 4, 6, 8)


def adpcm_encode_blocks(pcm, samples_per_block: int = 25):
    """IMA ADPCM encode int16 linear samples → per-block (header
    predictors, 4-bit nibble matrix). Sample count must be a multiple
    of ``samples_per_block``; each block stores its first sample
    verbatim in the header and 4-bit deltas for the rest. The step
    INDEX RESETS to 0 at every block boundary (spec-legal — the
    header carries the index, so any decoder plays it back exactly);
    that choice makes blocks independent, which is what lets both the
    numpy decoder and the SQL oracle process all blocks in parallel.
    Vectorized ACROSS blocks: the sequential loop is only over the
    ``samples_per_block - 1`` nibble positions."""
    import numpy as np

    k = np.asarray(pcm, dtype=np.int64)
    if k.size % samples_per_block:
        raise ValueError(
            f"sample count {k.size} not a multiple of {samples_per_block}"
        )
    k = k.reshape(-1, samples_per_block)
    step_t = np.asarray(_IMA_STEP_TABLE, dtype=np.int64)
    index_t = np.asarray(_IMA_INDEX_TABLE, dtype=np.int64)
    head = np.clip(k[:, 0], -32768, 32767)
    pred = head.copy()
    idx = np.zeros(len(k), dtype=np.int64)
    nibs = np.zeros((len(k), samples_per_block - 1), dtype=np.int64)
    for t in range(1, samples_per_block):
        step = step_t[idx]
        delta = k[:, t] - pred
        sign = np.where(delta < 0, 8, 0)
        d0 = np.abs(delta)
        b4 = (d0 >= step).astype(np.int64)
        d1 = d0 - step * b4
        b2 = (d1 >= step >> 1).astype(np.int64)
        b1 = (d1 - (step >> 1) * b2 >= step >> 2).astype(np.int64)
        n = sign | (b4 << 2) | (b2 << 1) | b1
        diff = (step >> 3) + (step >> 2) * b1 + (step >> 1) * b2 + step * b4
        pred = np.clip(pred + np.where(sign != 0, -diff, diff), -32768, 32767)
        idx = np.clip(idx + index_t[n], 0, 88)
        nibs[:, t - 1] = n
    return head, nibs


def adpcm_decode_blocks(preds, idx0, nibs):
    """IMA ADPCM decode: per-block header (predictor, step index) +
    nibble matrix → int16 linear samples (exact integers). Inverse of
    :func:`adpcm_encode_blocks` on its own output; honors whatever
    step index the header carries. Vectorized across blocks."""
    import numpy as np

    step_t = np.asarray(_IMA_STEP_TABLE, dtype=np.int64)
    index_t = np.asarray(_IMA_INDEX_TABLE, dtype=np.int64)
    nibs = np.asarray(nibs, dtype=np.int64)
    pred = np.asarray(preds, dtype=np.int64).copy()
    idx = np.clip(np.asarray(idx0, dtype=np.int64), 0, 88).copy()
    out = np.zeros((len(pred), nibs.shape[1] + 1), dtype=np.int64)
    out[:, 0] = pred
    for t in range(nibs.shape[1]):
        n = nibs[:, t]
        step = step_t[idx]
        diff = (
            (step >> 3)
            + (step >> 2) * (n & 1)
            + (step >> 1) * ((n >> 1) & 1)
            + step * ((n >> 2) & 1)
        )
        pred = np.clip(
            pred + np.where(n & 8, -diff, diff), -32768, 32767
        )
        idx = np.clip(idx + index_t[n], 0, 88)
        out[:, t + 1] = pred
    return out.ravel()


def adpcm_wav_bytes(pcm, sample_rate: int = 8000, block_align: int = 16) -> bytes:
    """Encode int16 linear samples as a mono IMA ADPCM WAV (RIFF
    format code 17 / 0x11, 4 bits/sample). Block layout per the public
    RIFF spec: 4-byte header (int16 predictor, uint8 step index, one
    reserved byte) then packed nibbles, LOW nibble first;
    ``samples_per_block = (block_align - 4) * 2 + 1`` goes in the fmt
    extension (``cbSize = 2``)."""
    import struct

    import numpy as np

    spb = (block_align - 4) * 2 + 1
    preds, nibs = adpcm_encode_blocks(pcm, spb)
    lo = nibs[:, 0::2]
    hi = nibs[:, 1::2]
    packed = (lo | (hi << 4)).astype(np.uint8)
    blocks = []
    for p, row in zip(preds, packed):
        blocks.append(struct.pack("<hBB", int(p), 0, 0) + row.tobytes())
    data = b"".join(blocks)
    byte_rate = sample_rate * block_align // spb
    fmt = struct.pack(
        "<HHIIHHHH", 17, 1, sample_rate, byte_rate, block_align, 4, 2, spb
    )
    body = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
        + (b"\x00" if len(data) % 2 else b"")
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_wav_adpcm(payload: bytes):
    """(samples float64 in [-1,1], sample_rate) from a mono IMA ADPCM
    WAV (format code 17). Decoded linear values are exact integers
    scaled by 1/32767 — the same scaling as :func:`decode_wav`."""
    import struct

    import numpy as np

    fmt_code = channels = sr = bits = block_align = None
    data = None
    for tag, chunk in _riff_chunks(payload):
        if tag == b"fmt " and len(chunk) >= 16:
            fmt_code, channels, sr, _br, block_align, bits = struct.unpack(
                "<HHIIHH", chunk[:16]
            )
        elif tag == b"data":
            data = chunk
    if fmt_code is None or data is None:
        raise ValueError("WAVE stream missing fmt/data chunk")
    if fmt_code != 17 or bits != 4:
        raise NotImplementedError("only 4-bit IMA ADPCM WAV here (format 17)")
    if channels != 1:
        raise NotImplementedError("only mono IMA ADPCM is supported")
    if block_align < 5 or len(data) % block_align:
        raise ValueError(f"data not a multiple of block_align {block_align}")
    raw = np.frombuffer(data, dtype=np.uint8).reshape(-1, block_align)
    preds = (
        raw[:, 0].astype(np.int64) | (raw[:, 1].astype(np.int64) << 8)
    )
    preds = np.where(preds >= 0x8000, preds - 0x10000, preds)
    idx0 = raw[:, 2].astype(np.int64)
    packed = raw[:, 4:].astype(np.int64)
    nibs = np.zeros((len(raw), packed.shape[1] * 2), dtype=np.int64)
    nibs[:, 0::2] = packed & 0x0F
    nibs[:, 1::2] = packed >> 4
    x = adpcm_decode_blocks(preds, idx0, nibs).astype(np.float64) / 32767.0
    return x, sr


def alaw_wav_bytes(pcm, sample_rate: int = 8000) -> bytes:
    """Encode int16 linear samples as a mono G.711 A-law WAV (RIFF
    format code 6, 8 bits/sample, 18-byte fmt chunk with ``cbSize = 0``
    as non-PCM WAVE requires). Same container layout as
    :func:`mulaw_wav_bytes`, different companding law."""
    import struct

    data = alaw_compress(pcm).tobytes()
    fmt = struct.pack(
        "<HHIIHHH", 6, 1, sample_rate, sample_rate * 1, 1, 8, 0
    )
    body = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
        + (b"\x00" if len(data) % 2 else b"")
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body


def _riff_chunks(payload: bytes):
    """Yield (tag, data) for each chunk of a RIFF/WAVE stream; raises
    ``ValueError`` on a non-WAVE or truncated container."""
    import struct

    if len(payload) < 12 or payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE stream")
    i = 12
    while i + 8 <= len(payload):
        tag = payload[i : i + 4]
        (size,) = struct.unpack("<I", payload[i + 4 : i + 8])
        if i + 8 + size > len(payload):
            raise ValueError("truncated RIFF chunk")
        yield tag, payload[i + 8 : i + 8 + size]
        i += 8 + size + (size % 2)  # chunks are word-aligned


def decode_wav_mulaw(payload: bytes):
    """(samples float64 in [-1,1], sample_rate) from a G.711 mu-law
    WAV (format code 7). Expanded linear values are exact integers
    scaled by 1/32767 — the same scaling as :func:`decode_wav`, so
    ``rint(x * 32767)`` in the hash paths recovers them exactly."""
    import struct

    import numpy as np

    fmt_code = channels = sr = bits = None
    data = None
    for tag, chunk in _riff_chunks(payload):
        if tag == b"fmt " and len(chunk) >= 16:
            fmt_code, channels, sr, _br, _ba, bits = struct.unpack(
                "<HHIIHH", chunk[:16]
            )
        elif tag == b"data":
            data = chunk
    if fmt_code is None or data is None:
        raise ValueError("WAVE stream missing fmt/data chunk")
    if fmt_code != 7 or bits != 8:
        raise NotImplementedError("only 8-bit mu-law WAV here (format 7)")
    x = mulaw_expand(np.frombuffer(data, dtype=np.uint8)).astype(np.float64)
    x /= 32767.0
    if channels and channels > 1:
        x = x[: (x.size // channels) * channels].reshape(-1, channels).mean(axis=1)
    return x, sr


def decode_wav_alaw(payload: bytes):
    """(samples float64 in [-1,1], sample_rate) from a G.711 A-law
    WAV (format code 6). Expanded linear values are exact integers
    scaled by 1/32767 — the same scaling as :func:`decode_wav`, so
    ``rint(x * 32767)`` in the hash paths recovers them exactly."""
    import struct

    import numpy as np

    fmt_code = channels = sr = bits = None
    data = None
    for tag, chunk in _riff_chunks(payload):
        if tag == b"fmt " and len(chunk) >= 16:
            fmt_code, channels, sr, _br, _ba, bits = struct.unpack(
                "<HHIIHH", chunk[:16]
            )
        elif tag == b"data":
            data = chunk
    if fmt_code is None or data is None:
        raise ValueError("WAVE stream missing fmt/data chunk")
    if fmt_code != 6 or bits != 8:
        raise NotImplementedError("only 8-bit A-law WAV here (format 6)")
    x = alaw_expand(np.frombuffer(data, dtype=np.uint8)).astype(np.float64)
    x /= 32767.0
    if channels and channels > 1:
        x = x[: (x.size // channels) * channels].reshape(-1, channels).mean(axis=1)
    return x, sr


def _wav_format_code(payload: bytes) -> "int | None":
    """The RIFF fmt-chunk format code, or None for non-RIFF payloads."""
    import struct

    try:
        for tag, chunk in _riff_chunks(payload):
            if tag == b"fmt " and len(chunk) >= 2:
                return struct.unpack("<H", chunk[:2])[0]
    except ValueError:
        return None
    return None


def decode_audio(payload: bytes):
    """(samples float64 in [-1,1], sample_rate) from any supported
    audio container — format-code dispatch: 16-bit PCM WAV
    (:func:`decode_wav`), G.711 A-law WAV (:func:`decode_wav_alaw`)
    or G.711 mu-law WAV (:func:`decode_wav_mulaw`). The audio twin of
    :func:`decode_image`: every audio feature/hash path routes through
    here, so a new codec lights up the whole audio pipeline at once.
    Unsupported codecs raise ``NotImplementedError`` at the decode
    site (the documented stub boundary); corrupt containers raise
    ``ValueError``."""
    code = _wav_format_code(payload)
    if code == 1:
        return decode_wav(payload)
    if code == 6:
        return decode_wav_alaw(payload)
    if code == 7:
        return decode_wav_mulaw(payload)
    if code == 17:
        return decode_wav_adpcm(payload)
    if code is None:
        raise ValueError("not a RIFF/WAVE stream")
    raise NotImplementedError(
        f"unsupported WAV format code {code} "
        "(PCM16 / A-law / mu-law / IMA ADPCM only)"
    )


def decode_ppm(payload: bytes):
    """(H, W, 3) uint8 array from binary P6 PPM."""
    import numpy as np

    if not payload.startswith(b"P6"):
        raise NotImplementedError("only binary P6 PPM is supported")
    # header: magic, width, height, maxval — whitespace/comment separated
    fields, i = [], 2
    while len(fields) < 3:
        while i < len(payload) and payload[i : i + 1].isspace():
            i += 1
        if payload[i : i + 1] == b"#":  # comment line
            i = payload.index(b"\n", i) + 1
            continue
        j = i
        while j < len(payload) and not payload[j : j + 1].isspace():
            j += 1
        fields.append(int(payload[i:j]))
        i = j
    i += 1  # single whitespace after maxval
    w, h, maxval = fields
    if maxval != 255:
        raise NotImplementedError("only maxval=255 PPM is supported")
    return np.frombuffer(payload, dtype=np.uint8, count=h * w * 3, offset=i).reshape(
        h, w, 3
    )


_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def png_bytes(pixels, filter_type: "int | str" = 0) -> bytes:
    """Encode an (H, W, 3) uint8 array as a REAL 8-bit truecolor PNG
    (stdlib ``zlib``/``struct`` only — public spec, RFC 2083). Written
    for fixtures: ``filter_type`` selects the per-scanline filter
    (0-4), or ``"cycle"`` applies filter ``r % 5`` to row ``r`` so one
    payload exercises every unfilter path in :func:`decode_png`."""
    import struct
    import zlib

    import numpy as np

    px = np.asarray(pixels, dtype=np.uint8)
    h, w, ch = px.shape
    if ch != 3:
        raise ValueError("png_bytes writes truecolor (H, W, 3) arrays")
    raw = bytearray()
    prev = np.zeros(w * ch, dtype=np.int64)
    for r in range(h):
        line = px[r].reshape(-1).astype(np.int64)
        ft = (r % 5) if filter_type == "cycle" else int(filter_type)
        left = np.concatenate([np.zeros(ch, dtype=np.int64), line[:-ch]])
        ul = np.concatenate([np.zeros(ch, dtype=np.int64), prev[:-ch]])
        if ft == 0:
            enc = line
        elif ft == 1:
            enc = line - left
        elif ft == 2:
            enc = line - prev
        elif ft == 3:
            enc = line - ((left + prev) >> 1)
        elif ft == 4:
            p = left + prev - ul
            pa, pb, pc = abs(p - left), abs(p - prev), abs(p - ul)
            pred = np.where(
                (pa <= pb) & (pa <= pc), left, np.where(pb <= pc, prev, ul)
            )
            enc = line - pred
        else:
            raise ValueError(f"PNG filter type {ft}")
        raw.append(ft)
        raw.extend((enc & 0xFF).astype(np.uint8).tobytes())
        prev = line

    def chunk(ctype: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + ctype
            + data
            + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    return (
        _PNG_SIG
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(raw), 6))
        + chunk(b"IEND", b"")
    )


def decode_png(payload: bytes):
    """(H, W, 3) uint8 array from a REAL PNG stream — stdlib-only
    decode (``zlib`` inflate + per-scanline unfiltering, public spec):
    8-bit depth, color types 0 (gray, replicated to RGB), 2 (RGB) and
    6 (RGBA, alpha dropped), all five filter types, non-interlaced.
    Chunk CRCs are VERIFIED and truncation at any layer (chunk header,
    chunk body, inflate stream, pixel count) raises — corrupt blobs
    must fail the decode site loudly so ``on_error="skip"`` can
    quarantine them. Adam7 interlacing, palettes and 16-bit depth stay
    principled ``NotImplementedError`` stubs.

    Unfiltering Sub/Average/Paeth is a per-pixel recurrence (each byte
    depends on the reconstructed left neighbor) — a sequential loop by
    nature; it runs executor-side over Arrow batches, so corpus-scale
    parallelism comes from rows, not pixels.
    """
    import struct
    import zlib

    import numpy as np

    if not payload.startswith(_PNG_SIG):
        raise NotImplementedError("not a PNG stream")
    i = len(_PNG_SIG)
    ihdr = None
    idat: list[bytes] = []
    seen_iend = False
    while i < len(payload):
        if i + 8 > len(payload):
            raise ValueError("truncated PNG chunk header")
        (length,) = struct.unpack(">I", payload[i : i + 4])
        ctype = payload[i + 4 : i + 8]
        data = payload[i + 8 : i + 8 + length]
        if len(data) != length:
            raise ValueError("truncated PNG chunk data")
        crc = payload[i + 8 + length : i + 12 + length]
        if len(crc) != 4:
            raise ValueError("truncated PNG chunk crc")
        if struct.unpack(">I", crc)[0] != zlib.crc32(ctype + data) & 0xFFFFFFFF:
            raise ValueError(f"PNG chunk {ctype!r} CRC mismatch")
        if ctype == b"IHDR":
            ihdr = data
        elif ctype == b"IDAT":
            idat.append(data)
        elif ctype == b"IEND":
            seen_iend = True
            break
        i += 12 + length
    if ihdr is None or not idat or not seen_iend:
        raise ValueError("PNG missing IHDR/IDAT/IEND")
    w, h, depth, color, comp, filt, interlace = struct.unpack(
        ">IIBBBBB", ihdr
    )
    if depth != 8:
        raise NotImplementedError(f"PNG bit depth {depth} unsupported (8 only)")
    if color not in (0, 2, 6):
        raise NotImplementedError(
            f"PNG color type {color} unsupported (gray/RGB/RGBA only)"
        )
    if interlace:
        raise NotImplementedError("Adam7-interlaced PNG unsupported")
    if comp or filt:
        raise ValueError("invalid PNG compression/filter method")
    ch = {0: 1, 2: 3, 6: 4}[color]
    raw = zlib.decompress(b"".join(idat))
    stride = w * ch
    if len(raw) != (stride + 1) * h:
        raise ValueError("PNG pixel data length mismatch")
    out = np.empty((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.int64)
    pos = 0
    for r in range(h):
        ftype = raw[pos]
        pos += 1
        line = np.frombuffer(
            raw, dtype=np.uint8, count=stride, offset=pos
        ).astype(np.int64)
        pos += stride
        if ftype == 0:
            cur = line
        elif ftype == 1:  # Sub
            cur = line.copy()
            for x in range(ch, stride):
                cur[x] = (cur[x] + cur[x - ch]) & 0xFF
        elif ftype == 2:  # Up
            cur = (line + prev) & 0xFF
        elif ftype == 3:  # Average
            cur = line.copy()
            for x in range(stride):
                left = cur[x - ch] if x >= ch else 0
                cur[x] = (cur[x] + ((left + prev[x]) >> 1)) & 0xFF
        elif ftype == 4:  # Paeth
            cur = line.copy()
            for x in range(stride):
                a = cur[x - ch] if x >= ch else 0
                b = prev[x]
                c = prev[x - ch] if x >= ch else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                cur[x] = (cur[x] + pred) & 0xFF
        else:
            raise ValueError(f"PNG filter type {ftype}")
        out[r] = cur.astype(np.uint8)
        prev = cur
    px = out.reshape(h, w, ch)
    if ch == 1:
        px = np.repeat(px, 3, axis=2)
    elif ch == 4:
        px = px[:, :, :3]
    return px


def bmp_bytes(pixels) -> bytes:
    """Encode an (H, W, 3) uint8 array as a 24-bpp uncompressed BMP
    (BITMAPINFOHEADER, BGR byte order, bottom-up rows, 4-byte row
    padding — the public Windows DIB layout, stdlib ``struct`` only)."""
    import struct

    import numpy as np

    px = np.asarray(pixels, dtype=np.uint8)
    h, w, _ = px.shape
    row = w * 3
    pad = (4 - row % 4) % 4
    body = bytearray()
    for r in range(h - 1, -1, -1):  # bottom-up
        body.extend(px[r, :, ::-1].tobytes())  # RGB → BGR
        body.extend(b"\x00" * pad)
    off = 14 + 40
    return (
        struct.pack("<2sIHHI", b"BM", off + len(body), 0, 0, off)
        + struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(body), 2835, 2835, 0, 0)
        + bytes(body)
    )


def decode_bmp(payload: bytes):
    """(H, W, 3) uint8 from an uncompressed 24/32-bpp BMP — both
    bottom-up (positive height) and top-down (negative) row orders;
    compressed (RLE) and paletted variants raise the principled
    ``NotImplementedError``. Truncation raises."""
    import struct

    import numpy as np

    if not payload.startswith(b"BM"):
        raise NotImplementedError("not a BMP stream")
    if len(payload) < 54:
        raise ValueError("truncated BMP header")
    off = struct.unpack_from("<I", payload, 10)[0]
    hdr_size = struct.unpack_from("<I", payload, 14)[0]
    if hdr_size < 40:
        raise NotImplementedError("BMP core-header variants unsupported")
    w, h_raw = struct.unpack_from("<ii", payload, 18)
    planes, bpp = struct.unpack_from("<HH", payload, 26)
    compression = struct.unpack_from("<I", payload, 30)[0]
    if compression != 0:
        raise NotImplementedError("compressed BMP (RLE/bitfields) unsupported")
    if bpp not in (24, 32):
        raise NotImplementedError(f"{bpp}-bpp BMP unsupported (24/32 only)")
    if w <= 0 or h_raw == 0 or planes != 1:
        raise ValueError("invalid BMP dimensions")
    h = abs(h_raw)
    ch = bpp // 8
    stride = (w * ch + 3) // 4 * 4
    need = off + stride * h
    if len(payload) < need:
        raise ValueError("truncated BMP pixel data")
    rows = np.frombuffer(payload, dtype=np.uint8, count=stride * h, offset=off)
    rows = rows.reshape(h, stride)[:, : w * ch].reshape(h, w, ch)
    if h_raw > 0:  # bottom-up storage
        rows = rows[::-1]
    return rows[:, :, 2::-1].copy()  # BGR(A) → RGB


def decode_image(payload: bytes):
    """(H, W, 3) uint8 from any supported image container — magic-byte
    dispatch: binary P6 PPM (:func:`decode_ppm`), PNG
    (:func:`decode_png`), uncompressed BMP (:func:`decode_bmp`),
    baseline JPEG (:mod:`~uofi_payroll_etl_main_demo_spark.ext.jpeg`)
    or single-frame GIF (:mod:`~uofi_payroll_etl_main_demo_spark.ext.gif`).
    Unsupported codecs raise ``NotImplementedError`` at the decode
    site, the documented stub boundary. Every hash/resize path routes
    through here, so a new codec lights up the whole image pipeline at
    once."""
    if payload.startswith(b"P6"):
        return decode_ppm(payload)
    if payload.startswith(_PNG_SIG):
        return decode_png(payload)
    if payload.startswith(b"BM"):
        return decode_bmp(payload)
    if payload.startswith(b"\xff\xd8"):
        from uofi_payroll_etl_main_demo_spark.ext.jpeg import decode_jpeg

        return decode_jpeg(payload)
    if payload.startswith(b"GIF8"):
        from uofi_payroll_etl_main_demo_spark.ext.gif import decode_gif

        return decode_gif(payload)
    raise NotImplementedError(
        "unsupported image codec (P6 PPM / PNG / BMP / JPEG / GIF only)"
    )


def audio_features(media: DataFrame) -> DataFrame:
    """REAL audio decode + features over ``mapInPandas``: RMS, zero-
    crossing rate, and FFT spectral centroid per PCM-WAV payload.
    Embarrassingly parallel — payloads stay executor-side in Arrow
    batches; non-WAV rows are skipped (filter upstream by mime)."""

    def batches(it: Iterator) -> Iterator:
        import numpy as np
        import pandas as pd

        for pdf in it:
            out = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                if payload is None:
                    continue
                x, sr = decode_audio(bytes(payload))
                n = x.size
                rms = float(np.sqrt(np.mean(x**2))) if n else 0.0
                zcr = (
                    float(np.mean(np.signbit(x[1:]) != np.signbit(x[:-1])))
                    if n > 1
                    else 0.0
                )
                if n:
                    mag = np.abs(np.fft.rfft(x))
                    freqs = np.fft.rfftfreq(n, d=1.0 / sr)
                    tot = mag.sum()
                    cent = float((freqs * mag).sum() / tot) if tot else 0.0
                else:
                    cent = 0.0
                out.append(
                    (mid, n, sr, 1000.0 * n / sr if sr else 0.0, rms, zcr, cent)
                )
            yield pd.DataFrame(
                out,
                columns=[
                    "media_id", "n_samples", "sample_rate", "duration_ms",
                    "rms", "zero_cross_rate", "spectral_centroid_hz",
                ],
            )

    return media.mapInPandas(batches, AUDIO_FEATURE_SCHEMA)


def image_features(media: DataFrame) -> DataFrame:
    """REAL image decode + features over ``mapInPandas``: per-channel
    means and a 4×4 block-averaged grayscale thumbnail (the resize
    primitive) per P6-PPM payload."""

    def batches(it: Iterator) -> Iterator:
        import numpy as np
        import pandas as pd

        for pdf in it:
            out = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                if payload is None:
                    continue
                px = decode_image(bytes(payload)).astype(np.float64)
                h, w, _ = px.shape
                gray = px.mean(axis=2)
                # block-average to 4x4: split rows/cols into 4 nearly
                # equal bands (handles non-multiples of 4)
                rb = np.array_split(np.arange(h), 4)
                cb = np.array_split(np.arange(w), 4)
                thumb = [
                    float(gray[np.ix_(r, c)].mean())
                    for r in rb
                    for c in cb
                ]
                out.append(
                    (
                        mid, w, h,
                        float(px[:, :, 0].mean()),
                        float(px[:, :, 1].mean()),
                        float(px[:, :, 2].mean()),
                        np.asarray(thumb, dtype="float32").tolist(),
                    )
                )
            yield pd.DataFrame(
                out,
                columns=[
                    "media_id", "width", "height",
                    "mean_r", "mean_g", "mean_b", "thumb4",
                ],
            )

    return media.mapInPandas(batches, IMAGE_FEATURE_SCHEMA)


def synthetic_av_media(spark, n: int = 32) -> DataFrame:
    """Deterministic REAL media table: even ids are 440·(1+i/8) Hz sine
    WAVs, odd ids are horizontally-striped PPM images — decodable by
    :func:`audio_features` / :func:`image_features` with known ground
    truth (tests assert the centroid tracks the sine frequency and the
    stripe means are exact)."""
    import numpy as np

    rows = []
    for i in range(n):
        if i % 2 == 0:
            sr = 8000
            freq = 440.0 * (1 + (i // 2) % 8)
            t = np.arange(sr // 4) / sr  # 250 ms
            payload = wav_bytes(0.5 * np.sin(2 * np.pi * freq * t), sr)
            meta = ("audio", "audio/wav", None, None, 250, sr)
        else:
            w, h = 16, 12
            px = np.zeros((h, w, 3), dtype=np.uint8)
            px[: h // 2, :, 0] = 200  # top half red
            px[h // 2 :, :, 2] = 100 + (i % 5) * 20  # bottom half blue
            payload = ppm_bytes(px)
            meta = ("image", "image/x-portable-pixmap", w, h, None, None)
        rows.append((i, payload, dict(zip(
            ["modality", "mime", "width", "height", "duration_ms",
             "sample_rate"], meta))))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


ENERGY_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("win_idx", T.IntegerType()),
        T.StructField("n_samples", T.IntegerType()),
        T.StructField("rms", T.DoubleType()),
    ]
)


def audio_energy_profile(media: DataFrame, window_ms: int = 25) -> DataFrame:
    """REAL audio decode + WINDOWED energy profile over ``mapInPandas``:
    per fixed-length window (default 25 ms) of each PCM-WAV payload,
    emit the window's RMS — the silence/clipping detector and VAD
    front-end of audio-corpus curation. The final partial window is
    kept with its true sample count.

    Same Arrow-batched executor-side contract as
    :func:`audio_features`; windows explode rows BEFORE any shuffle,
    so a long recording parallelizes downstream like ordinary rows.
    """

    def batches(it: Iterator) -> Iterator:
        import numpy as np
        import pandas as pd

        for pdf in it:
            out = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                if payload is None:
                    continue
                x, sr = decode_audio(bytes(payload))
                win = max(1, sr * window_ms // 1000)
                for j in range(0, x.size, win):
                    seg = x[j : j + win]
                    out.append(
                        (
                            mid,
                            j // win,
                            int(seg.size),
                            float(np.sqrt(np.mean(seg**2))),
                        )
                    )
            yield pd.DataFrame(
                out, columns=["media_id", "win_idx", "n_samples", "rms"]
            )

    return media.mapInPandas(batches, ENERGY_SCHEMA)


TILE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("tile_r", T.IntegerType()),
        T.StructField("tile_c", T.IntegerType()),
        T.StructField("mean_gray", T.DoubleType()),
    ]
)


def image_tile_means(media: DataFrame, grid: int = 4) -> DataFrame:
    """REAL image decode + grid-tiled grayscale means over
    ``mapInPandas`` — the patchwise feature/resize primitive (one row
    per tile, float64 end-to-end so the closed-form oracle compares at
    round-6). Tiles explode BEFORE any shuffle; non-multiple
    dimensions split into near-equal bands like ``image_features``."""

    def batches(it: Iterator) -> Iterator:
        import numpy as np
        import pandas as pd

        for pdf in it:
            out = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                if payload is None:
                    continue
                px = decode_image(bytes(payload)).astype(np.float64)
                h, w, _ = px.shape
                gray = px.mean(axis=2)
                rb = np.array_split(np.arange(h), grid)
                cb = np.array_split(np.arange(w), grid)
                for r, rows in enumerate(rb):
                    for c, cols in enumerate(cb):
                        out.append(
                            (
                                mid,
                                r,
                                c,
                                float(gray[np.ix_(rows, cols)].mean()),
                            )
                        )
            yield pd.DataFrame(
                out, columns=["media_id", "tile_r", "tile_c", "mean_gray"]
            )

    return media.mapInPandas(batches, TILE_SCHEMA)


def _gradient_pixels(i: int, width: int, height: int):
    """The gradient-fixture pixel law, ONE implementation for every
    payload twin (PPM/PNG/JPEG): image ``i`` renders pattern
    ``g = i // 2`` as ``v = 3 + (g*37 + c*c*11 + r*7) % 237``; even
    ids store v on all channels, odd ids are the channel-shifted
    (+3/0/−3) luminance-identical twin. The SQL oracles reproduce this
    exact law — a fixture tweak must happen HERE (and there), nowhere
    else."""
    import numpy as np

    g = i // 2
    r_idx = np.arange(height).reshape(-1, 1)
    c_idx = np.arange(width).reshape(1, -1)
    v = 3 + (g * 37 + c_idx * c_idx * 11 + r_idx * 7) % 237
    px = np.zeros((height, width, 3), dtype=np.uint8)
    if i % 2 == 0:
        px[:, :, 0] = v
        px[:, :, 1] = v
        px[:, :, 2] = v
    else:
        px[:, :, 0] = v + 3
        px[:, :, 1] = v
        px[:, :, 2] = v - 3
    return px


def _separated_pixels(i: int, width: int, height: int):
    """The SEPARATED-pattern pixel law for the lossy-codec fixtures:
    ``v = 3 + (g*37 + c*c*11 + r*7 + g*c*19) % 237`` with
    ``g = i // 2`` — the gradient law plus a ``g*c*19`` cross term
    that makes every pattern's COLUMN PROFILE structurally different
    (under the plain gradient law patterns differ only by an additive
    constant, so cross-pattern dHash distances collapse to 1 bit —
    measured r11 — and no Hamming threshold can separate twins from
    strangers once a lossy codec adds drift).  With the cross term the
    48-image corpus measures: twin lossless distance 0, cross-pattern
    lossless minimum 17, JPEG(q=95) per-image drift <= 2 bits
    (pinned in tests/test_jpeg.py::test_separated_jpeg_margins).
    Margin arithmetic: observed twin distance <= 0 + 2*2 = 4 <= 6 and
    observed cross distance >= 17 - 2*2 = 13 > 6, so threshold 6
    yields EXACTLY the 24 twin pairs — a closed-form pair oracle for a
    lossy codec, the same argument ext_video_keyframes_avi uses.
    Even/odd channel layout is identical to :func:`_gradient_pixels`."""
    import numpy as np

    g = i // 2
    r_idx = np.arange(height).reshape(-1, 1)
    c_idx = np.arange(width).reshape(1, -1)
    v = 3 + (g * 37 + c_idx * c_idx * 11 + r_idx * 7 + g * c_idx * 19) % 237
    px = np.zeros((height, width, 3), dtype=np.uint8)
    if i % 2 == 0:
        px[:, :, 0] = v
        px[:, :, 1] = v
        px[:, :, 2] = v
    else:
        px[:, :, 0] = v + 3
        px[:, :, 1] = v
        px[:, :, 2] = v - 3
    return px


def synthetic_separated_images_jpeg(
    spark, n: int = 48, width: int = 18, height: int = 16, quality: int = 95
) -> "DataFrame":
    """REAL baseline-JPEG payloads over the SEPARATED pixel law
    (:func:`_separated_pixels`): image ``i`` renders pattern
    ``i // 2``; odd ids are channel-shifted luminance-identical twins.
    Unlike :func:`synthetic_gradient_images_jpeg` (whose cross-pattern
    margin is 1 bit — unusable under lossy drift), this corpus has a
    17-bit cross-pattern floor vs <= 2 bits of q=95 quantization drift
    per image, so the Hamming-6 pair set is EXACTLY the 24 (2g, 2g+1)
    twin pairs by margin arithmetic and the registry row carries a
    closed-form value oracle."""
    from uofi_payroll_etl_main_demo_spark.ext.jpeg import jpeg_bytes

    rows = []
    for i in range(n):
        px = _separated_pixels(i, width, height)
        rows.append(
            (
                i,
                jpeg_bytes(px, quality=quality),
                {
                    "modality": "image",
                    "mime": "image/jpeg",
                    "width": width,
                    "height": height,
                    "duration_ms": None,
                    "sample_rate": None,
                },
            )
        )
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def synthetic_gradient_images(
    spark, n: int = 48, width: int = 18, height: int = 16
) -> "DataFrame":
    """Deterministic REAL gradient-image table for perceptual-hash
    dedup: image ``i`` renders pattern ``g = i // 2``; even ids store
    the pattern on all three channels, odd ids are the BYTEWISE
    DIFFERENT but PERCEPTUALLY IDENTICAL twin (channels shifted
    +3/0/-3, so the per-pixel grayscale mean — and therefore any
    luminance-based perceptual hash — is unchanged).

    Pixel law (closed form, reproduced by the SQL oracle):
        v(g, r, c) = 3 + (g*37 + c*c*11 + r*7) % 237
    which keeps v±3 inside [0, 255].
    """
    import numpy as np

    rows = []
    for i in range(n):
        px = _gradient_pixels(i, width, height)
        rows.append(
            (
                i,
                ppm_bytes(px),
                {
                    "modality": "image",
                    "mime": "image/x-portable-pixmap",
                    "width": width,
                    "height": height,
                    "duration_ms": None,
                    "sample_rate": None,
                },
            )
        )
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def synthetic_gradient_images_png(
    spark, n: int = 48, width: int = 18, height: int = 16
) -> "DataFrame":
    """The PNG twin of :func:`synthetic_gradient_images` — SAME pixel
    law ``v(g, r, c) = 3 + (g*37 + c*c*11 + r*7) % 237`` (odd ids are
    channel-shifted luminance-identical twins), but payloads are REAL
    compressed PNG streams, with image ``i`` written using scanline
    filter ``i % 5`` so the corpus collectively exercises every
    unfilter path (None/Sub/Up/Average/Paeth). PNG decode is lossless,
    so every perceptual hash — and therefore the SQL oracle — is
    bit-identical to the PPM fixture's."""
    import numpy as np

    rows = []
    for i in range(n):
        px = _gradient_pixels(i, width, height)
        rows.append(
            (
                i,
                png_bytes(px, filter_type=i % 5),
                {
                    "modality": "image",
                    "mime": "image/png",
                    "width": width,
                    "height": height,
                    "duration_ms": None,
                    "sample_rate": None,
                },
            )
        )
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def synthetic_gradient_images_gif(
    spark, n: int = 48, width: int = 18, height: int = 16
) -> "DataFrame":
    """The GIF twin of :func:`synthetic_gradient_images` — SAME pixel
    law (odd ids channel-shifted luminance-identical twins), payloads
    REAL palette-indexed LZW GIF87a streams
    (:func:`~uofi_payroll_etl_main_demo_spark.ext.gif.gif_bytes`).
    GIF decode is lossless for palette-sized images (the gradient law
    uses ≤237 distinct colors), so every perceptual hash — and the SQL
    oracle — is bit-identical to the PPM/PNG fixtures'."""
    rows = []
    from uofi_payroll_etl_main_demo_spark.ext.gif import gif_bytes

    for i in range(n):
        px = _gradient_pixels(i, width, height)
        rows.append(
            (
                i,
                gif_bytes(px),
                {
                    "modality": "image",
                    "mime": "image/gif",
                    "width": width,
                    "height": height,
                    "duration_ms": None,
                    "sample_rate": None,
                },
            )
        )
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def synthetic_gradient_images_jpeg(
    spark, n: int = 48, width: int = 18, height: int = 16, quality: int = 95
) -> "DataFrame":
    """The JPEG twin of :func:`synthetic_gradient_images` — same pixel
    law, payloads REAL baseline-JPEG (entropy-coded, lossy). Unlike
    the PNG twin there is NO bit-exact oracle: quantization shifts
    pixels a few levels, so hashes are pinned by perceptual STABILITY
    (Hamming ≤ 2 of the lossless twin at q=95, tests/test_jpeg.py) and
    the registry row is rows-only by design."""
    import numpy as np

    from uofi_payroll_etl_main_demo_spark.ext.jpeg import jpeg_bytes

    rows = []
    for i in range(n):
        px = _gradient_pixels(i, width, height)
        rows.append(
            (
                i,
                jpeg_bytes(px, quality=quality),
                {
                    "modality": "image",
                    "mime": "image/jpeg",
                    "width": width,
                    "height": height,
                    "duration_ms": None,
                    "sample_rate": None,
                },
            )
        )
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


DHASH_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("dhash", T.LongType()),
    ]
)


def image_dhash(
    media: "DataFrame",
    grid_rows: int = 8,
    grid_cols: int = 9,
    on_error: str = "raise",
) -> "DataFrame":
    """Perceptual 64-bit dHash per image via ``mapInPandas`` — REAL
    P6-PPM decode, per-pixel grayscale (channel mean), block-mean
    downscale to ``grid_rows x grid_cols``, then one bit per
    horizontal neighbor comparison (``m[r, c+1] > m[r, c]``), packed
    little-endian as ``bit (r*(grid_cols-1) + c)`` — each row
    contributes ``grid_cols-1`` comparisons, so the default 8×9 grid
    fills exactly 64 bits — into a SIGNED int64 (bit 63 is
    the sign bit, same convention as the SimHash signatures, so
    :func:`~uofi_payroll_etl_main_demo_spark.ext.dedup.hamming_pairs_64`
    applies unchanged).

    dHash is the standard cheap near-dup fingerprint of image-corpus
    curation: invariant to bytewise re-encodes and uniform channel
    shifts (luminance-preserving), sensitive to structural edits.
    Each bit decision is EXACT integer arithmetic (the block-mean
    comparison cross-multiplies int64 channel-sum blocks, so no float
    rounding exists anywhere on the path), and the DuckDB oracle
    reproduces it bit-for-bit from the generation law — the whole
    decode→downscale→hash path is value-checked, not just row-counted.

    ``on_error="skip"`` drops undecodable payloads (truncated/corrupt
    bytes AND null payloads) instead of failing the task — at corpus
    scale one corrupt blob must quarantine, not kill the job; pair it
    with an anti-join against the output to materialize the quarantine
    set. The default ``"raise"`` keeps EVERY failure loud for curated
    fixtures, null payloads included — a null row must not silently
    vanish from a mode that promises loud failures.
    """
    if on_error not in ("raise", "skip"):
        raise ValueError(f"on_error must be 'raise' or 'skip': {on_error!r}")
    if grid_rows * (grid_cols - 1) > 64:
        # the packed hash is a single int64; a larger grid would wrap
        # uint64 shifts silently (numpy shift-by->=64 is undefined) —
        # fail loudly like the old Python-int path did at schema time
        raise ValueError(
            f"grid {grid_rows}x{grid_cols} needs "
            f"{grid_rows * (grid_cols - 1)} bits; the hash holds 64"
        )

    def batches(it: Iterator) -> Iterator:
        import numpy as np
        import pandas as pd

        for pdf in it:
            out = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                if payload is None:
                    if on_error == "skip":
                        continue
                    raise ValueError(f"null payload for media_id={mid}")
                try:
                    px = decode_image(bytes(payload))
                except Exception:
                    if on_error == "skip":
                        continue
                    raise
                # Vectorized block-mean grid (the old per-block Python
                # loop was the measured ~5× slower shape vs whash's
                # matmul — BASELINE WHT probe). EXACT integer math: the
                # bit decision  mean(b2) > mean(b1)  with equal row
                # extent reduces to  sum(b2)·n1 > sum(b1)·n2  over
                # int64 channel sums — no float rounding anywhere, so
                # hashes are bit-identical to the closed-form oracle by
                # construction (grayscale = channel mean shares the /3
                # across both sides and cancels).
                G = px.sum(axis=2, dtype=np.int64)
                h_, w_ = G.shape
                r_sizes = np.full(grid_rows, h_ // grid_rows, dtype=np.int64)
                r_sizes[: h_ % grid_rows] += 1
                c_sizes = np.full(grid_cols, w_ // grid_cols, dtype=np.int64)
                c_sizes[: w_ % grid_cols] += 1
                r_off = np.zeros(grid_rows, dtype=np.int64)
                np.cumsum(r_sizes[:-1], out=r_off[1:])
                c_off = np.zeros(grid_cols, dtype=np.int64)
                np.cumsum(c_sizes[:-1], out=c_off[1:])
                # images SMALLER than the grid: trailing offsets equal
                # the array length, which reduceat rejects. Clamping is
                # EXACT here: empty segments only exist when every
                # non-empty segment is a singleton (size pattern
                # 1,…,1,0,…,0), so the clamped equal-offset reduceat
                # returns precisely those singletons, and the empty
                # blocks' garbage reads are masked out of the bits
                # below (the old NaN-mean semantics: any comparison
                # touching an empty block is False).
                r_off = np.minimum(r_off, h_ - 1)
                c_off = np.minimum(c_off, w_ - 1)
                B = np.add.reduceat(
                    np.add.reduceat(G, r_off, axis=0), c_off, axis=1
                )
                nonempty = (r_sizes[:, None] > 0) & (c_sizes[None, :] > 0)
                bits = (B[:, 1:] * c_sizes[:-1]) > (B[:, :-1] * c_sizes[1:])
                bits &= nonempty[:, 1:] & nonempty[:, :-1]
                weights = np.left_shift(
                    np.uint64(1),
                    np.arange(grid_rows * (grid_cols - 1), dtype=np.uint64),
                )
                hv = int(
                    np.bitwise_or.reduce(
                        weights[bits.ravel()], initial=np.uint64(0)
                    )
                )
                if hv >= 1 << 63:
                    hv -= 1 << 64
                out.append((mid, hv))
            yield pd.DataFrame(out, columns=["media_id", "dhash"])

    return media.mapInPandas(batches, DHASH_SCHEMA)


WHASH_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("whash", T.LongType()),
    ]
)


def _hadamard(n: int):
    """Sylvester-ordered ±1 Hadamard matrix; equals the closed form
    ``H[u][t] = (-1)^popcount(u & t)`` (pinned in tests), which is how
    the SQL oracles build it without a 4096-row literal."""
    import numpy as np

    if n & (n - 1):
        raise ValueError(f"n must be a power of two: {n}")
    H = np.array([[1]])
    while H.shape[0] < n:
        H = np.block([[H, H], [H, -H]])
    return H


def _hadamard8():
    return _hadamard(8)


def image_whash(media: "DataFrame", on_error: str = "raise") -> "DataFrame":
    """Perceptual 63-bit Walsh–Hadamard hash per image — the
    frequency-domain sibling of :func:`image_dhash` (pHash uses a
    float DCT; the Sylvester-ordered WHT is its ±1 INTEGER analogue,
    so every bit decision is exact and the SQL oracle reproduces the
    whole transform). Law: integer channel-sum grayscale, crop to the
    largest 8-divisible box, 8×8 integer block sums, ``Y = H·X·H``,
    one bit per AC coefficient ``Y[k] > median`` (the 32nd-smallest
    of the 63 AC values — exact order statistic, no interpolation),
    packed little-endian at bit ``k-1`` (63 bits; bit 63 stays 0).

    Invariances (tested): channel shifts that preserve the channel
    sum, bytewise re-encodes through any lossless codec, and GLOBAL
    BRIGHTNESS SCALING (``v → a·v`` scales every coefficient and the
    median together — a case dHash's fixed neighbor comparisons also
    survive but averaging hashes do not). Structural edits move
    coefficients across the median. ``on_error`` semantics match
    :func:`image_dhash`."""
    if on_error not in ("raise", "skip"):
        raise ValueError(f"on_error must be 'raise' or 'skip': {on_error!r}")

    def batches(it: Iterator) -> Iterator:
        import numpy as np
        import pandas as pd

        H = _hadamard8()
        for pdf in it:
            out = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                if payload is None:
                    if on_error == "skip":
                        continue
                    raise ValueError(f"null payload for media_id={mid}")
                try:
                    px = decode_image(bytes(payload))
                except Exception:
                    if on_error == "skip":
                        continue
                    raise
                gray3 = px.astype(np.int64).sum(axis=2)
                h8 = (gray3.shape[0] // 8) * 8
                w8 = (gray3.shape[1] // 8) * 8
                if h8 < 8 or w8 < 8:
                    if on_error == "skip":
                        continue
                    raise ValueError(
                        f"image smaller than 8x8 for media_id={mid}"
                    )
                X = (
                    gray3[:h8, :w8]
                    .reshape(8, h8 // 8, 8, w8 // 8)
                    .sum(axis=(1, 3))
                )
                Y = (H @ X @ H).flatten()
                m = np.sort(Y[1:])[31]
                hv = 0
                for k in range(1, 64):
                    if Y[k] > m:
                        hv |= 1 << (k - 1)
                out.append((mid, hv))
            yield pd.DataFrame(out, columns=["media_id", "whash"])

    return media.mapInPandas(batches, WHASH_SCHEMA)


SPECTRAL_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("shash", T.LongType()),
    ]
)


def audio_spectral_hash(
    media: "DataFrame",
    window_samples: int = 64,
    max_windows: int = 64,
    on_error: str = "raise",
) -> "DataFrame":
    """Spectral audio fingerprint with an exact integer law: per
    window of ``window_samples`` int16 samples, the Walsh–Hadamard
    transform (the ±1 integer analogue of the FFT's spectrum — same
    role DCT↔WHT plays for :func:`image_whash`), then the DOMINANT
    SEQUENCY (argmax |coefficient|, ties to the lowest index) per
    window; one bit per rising dominant-sequency step, exactly like
    :func:`audio_energy_hash`'s rising-energy bits.

    Tracking WHERE the energy concentrates instead of HOW MUCH makes
    this hash invariant to polarity AND to any positive amplitude
    scaling (|a·Y| has the same argmax) — the gain-renormalized
    re-encode case an energy fingerprint cannot collapse. Everything
    is integer math, so the SQL oracle rebuilds the transform from
    the closed form ``H[u][t] = (-1)^popcount(u & t)``. ``on_error``
    semantics match :func:`audio_energy_hash`."""
    if on_error not in ("raise", "skip"):
        raise ValueError(f"on_error must be 'raise' or 'skip': {on_error!r}")
    if window_samples & (window_samples - 1) or window_samples < 2:
        raise ValueError(
            f"window_samples must be a power of two >= 2: {window_samples}"
        )
    if window_samples > 1024:
        # the dense Hadamard is window_samples^2 ints PER PARTITION
        # and the transform O(n^2) per window — cap before an
        # executor-OOM-sized matrix can be requested
        raise ValueError(
            f"window_samples = {window_samples} exceeds the dense-WHT "
            "bound (1024)"
        )

    def batches(it: Iterator) -> Iterator:
        import numpy as np
        import pandas as pd

        H = _hadamard(window_samples)
        for pdf in it:
            out = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                if payload is None:
                    if on_error == "skip":
                        continue
                    raise ValueError(f"null payload for media_id={mid}")
                try:
                    x, _sr = decode_audio(bytes(payload))
                except Exception:
                    if on_error == "skip":
                        continue
                    raise
                k = np.rint(x * 32767.0).astype(np.int64)
                nwin = min(k.size // window_samples, max_windows)
                if nwin < 2:
                    if on_error == "skip":
                        continue
                    raise ValueError(
                        f"clip shorter than two windows for media_id={mid}"
                    )
                X = k[: nwin * window_samples].reshape(nwin, window_samples)
                dom = np.abs(X @ H).argmax(axis=1)  # ties -> lowest index
                hv = 0
                for w in range(nwin - 1):
                    if dom[w + 1] > dom[w]:
                        hv |= 1 << w
                out.append((mid, hv))
            yield pd.DataFrame(out, columns=["media_id", "shash"])

    return media.mapInPandas(batches, SPECTRAL_SCHEMA)


def wav_bytes_pcm16(pcm, sample_rate: int = 8000) -> bytes:
    """Encode an int16 sample array as mono PCM WAV EXACTLY (no float
    scaling roundtrip — ``wav_bytes``'s ``*32767`` + truncation can
    land one LSB off, which would break integer-exact energy oracles)."""
    import io
    import wave

    import numpy as np

    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sample_rate)
        w.writeframes(np.asarray(pcm, dtype="<i2").tobytes())
    return buf.getvalue()


def synthetic_patterned_audio(
    spark,
    n: int = 32,
    windows: int = 64,
    window_samples: int = 50,
    codec: str = "pcm16",
) -> "DataFrame":
    """Deterministic REAL audio table for perceptual dedup: clip ``i``
    renders integer-PCM pattern ``g = i // 2``; odd ids are the
    POLARITY-INVERTED twin (bytewise different, identical per-window
    energy — the phase-flip/re-encode case an energy fingerprint must
    collapse).

    Sample law (closed form, reproduced by the SQL oracle):
        k(g, j) = ((g*31 + j*j*17 + (j // window_samples)*29) % 401) - 200

    ``codec="mulaw"`` / ``codec="alaw"`` write the same samples
    through the lossy G.711 encoders (:func:`mulaw_wav_bytes` /
    :func:`alaw_wav_bytes`) — the compressed-telephony twins of the
    PCM fixture. mu-law is sign-symmetric, so the polarity twins still
    quantize to mirrored samples with identical window energies.
    A-law is NOT exactly sign-symmetric (negatives fold as ``-m - 1``),
    so the twins' energies differ slightly — measured hamming ≤ 3 on
    this fixture, still inside the pairing threshold — and the oracle
    reproduces the asymmetric quantization exactly."""
    import numpy as np

    if codec not in ("pcm16", "mulaw", "alaw"):
        raise ValueError(f"codec must be 'pcm16', 'mulaw' or 'alaw': {codec!r}")
    total = windows * window_samples
    rows = []
    for i in range(n):
        g = i // 2
        j = np.arange(total, dtype=np.int64)
        k = ((g * 31 + j * j * 17 + (j // window_samples) * 29) % 401) - 200
        if i % 2 == 1:
            k = -k
        payload = {
            "pcm16": wav_bytes_pcm16,
            "mulaw": mulaw_wav_bytes,
            "alaw": alaw_wav_bytes,
        }[codec](k, 8000)
        rows.append(
            (
                i,
                payload,
                {
                    "modality": "audio",
                    "mime": "audio/basic" if codec == "mulaw" else "audio/wav",
                    "width": None,
                    "height": None,
                    "duration_ms": total * 1000 // 8000,
                    "sample_rate": 8000,
                },
            )
        )
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def synthetic_smooth_audio(
    spark,
    n: int = 32,
    windows: int = 64,
    window_samples: int = 50,
) -> "DataFrame":
    """Deterministic REAL audio table shaped for ADPCM: clip ``i``
    renders an amplitude-modulated TRIANGLE wave (sample-to-sample
    deltas the 4-bit delta coder can track, unlike the white-noise
    pattern of :func:`synthetic_patterned_audio` which ADPCM smears
    until distinct patterns collide — measured: cross-pattern hamming
    min 0 on noise vs 4 on this law). Odd ids are the polarity twin.

    Sample law (closed form, reproduced by the SQL oracle):
        w   = j // window_samples
        amp = 50 + (g*13 + w*7) % 100
        k   = ±amp * (25 - |j % window_samples - 25|)

    Payloads are IMA ADPCM WAV (format code 17, 16-byte blocks, 25
    samples per block; :func:`adpcm_wav_bytes`). ADPCM is NOT exactly
    sign-symmetric (a zero delta always encodes as +diff), but on this
    law the twins reconstruct with identical window-energy ORDER —
    measured twin hamming 0."""
    import numpy as np

    total = windows * window_samples
    rows = []
    for i in range(n):
        g = i // 2
        j = np.arange(total, dtype=np.int64)
        w = j // window_samples
        amp = 50 + (g * 13 + w * 7) % 100
        k = amp * (25 - np.abs(j % window_samples - 25))
        if i % 2 == 1:
            k = -k
        rows.append(
            (
                i,
                adpcm_wav_bytes(k, 8000),
                {
                    "modality": "audio",
                    "mime": "audio/wav",
                    "width": None,
                    "height": None,
                    "duration_ms": total * 1000 // 8000,
                    "sample_rate": 8000,
                },
            )
        )
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


EHASH_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("ehash", T.LongType()),
    ]
)


def audio_energy_hash(
    media: "DataFrame", window_samples: int = 50, on_error: str = "raise"
) -> "DataFrame":
    """Perceptual 64-bit audio fingerprint via ``mapInPandas`` — REAL
    PCM-WAV decode, integer sum-of-squares energy per fixed window
    (int16 samples recovered exactly with ``rint``; INTEGER sums, so
    every bit decision is engine-exact — no float summation order to
    disagree on), one bit per rising energy step
    (``e[w+1] > e[w]`` at bit ``w``; the final partial window is
    dropped; bit 63 unused/zero). The audio twin of :func:`image_dhash`
    — polarity flips, gain-preserving re-encodes and channel tricks
    hash identically; structural edits don't. Pairs via
    ``hamming_pairs_64`` on the ``ehash`` column.

    ``on_error="skip"`` quarantines undecodable payloads (nulls
    included) instead of failing the task; ``"raise"`` fails loud on
    nulls too (see :func:`image_dhash`).
    """
    if on_error not in ("raise", "skip"):
        raise ValueError(f"on_error must be 'raise' or 'skip': {on_error!r}")

    def batches(it: Iterator) -> Iterator:
        import numpy as np
        import pandas as pd

        for pdf in it:
            out = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                if payload is None:
                    if on_error == "skip":
                        continue
                    raise ValueError(f"null payload for media_id={mid}")
                try:
                    x, _sr = decode_audio(bytes(payload))
                except Exception:
                    if on_error == "skip":
                        continue
                    raise
                k = np.rint(x * 32767.0).astype(np.int64)
                nwin = k.size // window_samples
                e = (
                    (k[: nwin * window_samples] ** 2)
                    .reshape(nwin, window_samples)
                    .sum(axis=1)
                )
                hv = 0
                for w in range(min(nwin - 1, 63)):
                    if e[w + 1] > e[w]:
                        hv |= 1 << w
                out.append((mid, hv))
            yield pd.DataFrame(out, columns=["media_id", "ehash"])

    return media.mapInPandas(batches, EHASH_SCHEMA)


def synthetic_video_frame_images(
    spark, n_videos: int = 12, frames: int = 8,
    width: int = 18, height: int = 16,
) -> "DataFrame":
    """Deterministic sampled-frame table standing in for the video
    decode stage (real container codecs are stubbed in this
    environment — see module docstring; the frame images themselves
    are REAL P6 PPMs): video ``v`` renders pattern ``g = v // 2`` per
    frame ``f``; odd ids are the channel-shifted, luminance-identical
    re-encode twin of their even neighbor (every frame hashes equal).

    Pixel law: v(g, f, r, c) = 3 + (g*37 + f*23 + c*c*11 + r*7) % 237.
    Output: (video_id, frame_idx, payload).
    """
    import numpy as np

    rows = []
    for vid in range(n_videos):
        g = vid // 2
        for f in range(frames):
            r_idx = np.arange(height).reshape(-1, 1)
            c_idx = np.arange(width).reshape(1, -1)
            v = 3 + (g * 37 + f * 23 + c_idx * c_idx * 11 + r_idx * 7) % 237
            px = np.zeros((height, width, 3), dtype=np.uint8)
            if vid % 2 == 0:
                px[:, :, :] = v[:, :, None]
            else:
                px[:, :, 0] = v + 3
                px[:, :, 1] = v
                px[:, :, 2] = v - 3
            rows.append((vid, f, ppm_bytes(px)))
    return spark.createDataFrame(
        rows, "video_id bigint, frame_idx int, payload binary"
    )


def synthetic_scene_videos(
    spark,
    n_videos: int = 8,
    scenes: int = 4,
    scene_len: int = 4,
    width: int = 18,
    height: int = 16,
) -> "DataFrame":
    """Sampled-frame table WITH SCENE STRUCTURE (for keyframe /
    scene-change detection): video ``v`` renders pattern ``g = v//2``;
    frames within a scene are IDENTICAL, the pattern jumps at every
    scene boundary; odd ids are the channel-shifted luminance twin.

    Pixel law (reproduced by the SQL oracle):
        scene = f // scene_len
        v(g, scene, r, c) = 3 + (g*37 + scene*53 + c*c*11 + r*7) % 237

    Measured on the default geometry: within-scene dHash distance 0,
    scene-boundary distance 22–36 — any threshold in (0, 22) detects
    exactly the scene starts."""
    rows = []
    for vid in range(n_videos):
        for f in range(scenes * scene_len):
            px = _scene_frame_pixels(vid, f, scene_len, width, height)
            rows.append((vid, f, ppm_bytes(px)))
    return spark.createDataFrame(
        rows, "video_id bigint, frame_idx int, payload binary"
    )


def _scene_frame_pixels(
    vid: int, f: int, scene_len: int, width: int, height: int
):
    """The ONE scene-video pixel law (shared by the PPM frame-table
    fixture above and the AVI container fixture below, so the two
    cannot drift): pattern ``g = vid // 2`` jumps at scene boundaries;
    odd ids are the channel-shifted luminance twin."""
    import numpy as np

    g = vid // 2
    sc = f // scene_len
    r_idx = np.arange(height).reshape(-1, 1)
    c_idx = np.arange(width).reshape(1, -1)
    v = 3 + (g * 37 + sc * 53 + c_idx * c_idx * 11 + r_idx * 7) % 237
    px = np.zeros((height, width, 3), dtype=np.uint8)
    if vid % 2 == 0:
        px[:, :, :] = v[:, :, None]
    else:
        px[:, :, 0] = v + 3
        px[:, :, 1] = v
        px[:, :, 2] = v - 3
    return px


def synthetic_scene_videos_avi(
    spark,
    n_videos: int = 8,
    scenes: int = 4,
    scene_len: int = 4,
    width: int = 18,
    height: int = 16,
    quality: int = 95,
) -> "DataFrame":
    """The CONTAINER form of :func:`synthetic_scene_videos`: one row
    per video, payload = a REAL MJPEG AVI (RIFF headers + one baseline
    JPEG per frame, ext/avi.py) over the same scene pixel law. Lossy
    like the JPEG image twin, but the KEYFRAME SET stays exact:
    within-scene frames have identical pixels → identical JPEG bytes →
    Hamming 0, and scene-boundary distances (22–36 lossless) move ≤2
    bits per side at q=95 (the pinned JPEG stability bound), so any
    threshold in [5, 18] still detects exactly the scene starts.

    Output: (video_id, payload)."""
    from uofi_payroll_etl_main_demo_spark.ext.avi import avi_mjpeg_bytes
    from uofi_payroll_etl_main_demo_spark.ext.jpeg import jpeg_bytes

    rows = []
    for vid in range(n_videos):
        frames = [
            jpeg_bytes(
                _scene_frame_pixels(vid, f, scene_len, width, height),
                quality=quality,
            )
            for f in range(scenes * scene_len)
        ]
        rows.append((vid, avi_mjpeg_bytes(frames, width, height)))
    return spark.createDataFrame(rows, "video_id bigint, payload binary")


def _pack_video_frames(frames: "DataFrame") -> "DataFrame":
    """(media_id, payload) with ``media_id = video_id * 1e6 +
    frame_idx`` — ONE packing law for every per-frame video operator.
    The assert GATES media_id itself (``assert_true`` returns NULL on
    pass, so the ``when`` branch is evaluated row-by-row; an assert
    projected into a separate dropped column would be removed by
    column pruning and never run). Both components are guarded:
    ``frame_idx`` must fit the 1e6 slot AND ``video_id`` must be
    non-negative and small enough that the product stays in int64 —
    a negative video_id would otherwise truncate-divide into video 0
    and silently misattribute its frames."""
    packed_expr = F.col("video_id") * F.lit(1_000_000) + F.col("frame_idx")
    return frames.select(
        F.when(
            F.assert_true(
                (F.col("frame_idx") >= 0)
                & (F.col("frame_idx") < 1_000_000)
                & (F.col("video_id") >= 0)
                & (F.col("video_id") < 9_000_000_000_000),
                F.lit(
                    "video_id/frame_idx out of packing range "
                    "([0, 9e12) x [0, 1e6))"
                ),
            ).isNull(),
            packed_expr,
        ).alias("media_id"),
        "payload",
    )


def _unpack_video_sig(sigs: "DataFrame", hash_col: str) -> "DataFrame":
    """Inverse of :func:`_pack_video_frames` over a signature frame —
    integer div/mod (float division truncates wrongly past 2^53)."""
    return sigs.select(
        F.expr("CAST(media_id div 1000000 AS BIGINT)").alias("video_id"),
        F.expr("CAST(media_id % 1000000 AS INT)").alias("frame_idx"),
        hash_col,
    )


def video_keyframes(
    frames: "DataFrame",
    min_hamming: int = 8,
    on_error: str = "raise",
) -> "DataFrame":
    """Keyframe / scene-change detection from sampled frames: per-frame
    perceptual dHash (:func:`image_dhash` — real decode), then one
    window ``lag`` per video ordered by frame index; a frame is a
    keyframe when it is the video's first DECODED frame (``hamming_prev``
    NULL) or its hash sits ``>= min_hamming`` bits from the previous
    decoded frame's. The standard shot-boundary recipe of video
    curation pipelines (frame-signature distance thresholding),
    shaped as one narrow hash pass + one per-video window — no joins,
    no shuffle beyond the per-video window sort.

    With ``on_error="skip"`` corrupt frames quarantine and the lag
    compares across the gap (distances are BETWEEN DECODED FRAMES —
    the honest semantics when a frame is missing).

    Returns (video_id, frame_idx, hamming_prev) for keyframes only;
    ``hamming_prev`` is NULL on each video's first decoded frame."""
    from pyspark.sql import Window

    sigs = _unpack_video_sig(
        image_dhash(_pack_video_frames(frames), on_error=on_error), "dhash"
    )
    w = Window.partitionBy("video_id").orderBy("frame_idx")
    prev = F.lag("dhash").over(w)
    ham = F.bit_count(F.col("dhash").bitwiseXOR(prev))
    return (
        sigs.withColumn("hamming_prev", ham.cast("int"))
        .filter(
            F.col("hamming_prev").isNull()
            | (F.col("hamming_prev") >= min_hamming)
        )
        .select("video_id", "frame_idx", "hamming_prev")
    )


_VIDEO_SIG_POOL: list = []


def video_near_dup_pairs(
    frames: "DataFrame",
    n_frames: "int | None" = None,
    min_match_fraction: float = 0.5,
    on_error: str = "raise",
) -> "DataFrame":
    """Video near-dup pairs from sampled frames: per-frame perceptual
    dHash (:func:`image_dhash` — REAL PPM decode), then candidates via
    an EQUI-join on ``(frame_idx, dhash)`` — two videos pair only
    where a sampled frame hashes identically at the same position, so
    there is never an all-pairs comparison; a video-pair's match count
    aggregates from the join and thresholds the output. The standard
    sampled-frame fingerprint recipe of video-corpus dedup, shaped as
    one narrow hash pass + one hash-bucketed join + one pair agg.

    ``match_fraction`` divides by the frames each video ACTUALLY
    decoded (``greatest(n_decoded_a, n_decoded_b)``), not a
    caller-declared count — with ``on_error="skip"`` quarantining
    corrupt frames, a declared denominator under-reports (fraction
    could exceed 1.0) or masks true duplicates. Passing ``n_frames``
    turns it into a loud VALIDATION: any video whose decoded count
    differs fails the job (leave it ``None`` with ``on_error="skip"``,
    where differing counts are expected).

    Returns (vid_a, vid_b, n_match, match_fraction), vid_a < vid_b.
    """
    # PERSISTED: three plans consume the signatures (per-video decoded
    # counts + both sides of the candidate self-join) and the decode is
    # the expensive stage — without the cache every frame decodes 3×.
    # Lifetime: cache.swap_pooled (one cached signature frame per
    # session). Packing/unpacking shares _pack_video_frames'
    # guarded law with video_keyframes.
    from uofi_payroll_etl_main_demo_spark.cache import swap_pooled

    sigs = swap_pooled(
        _VIDEO_SIG_POOL,
        _unpack_video_sig(
            image_dhash(_pack_video_frames(frames), on_error=on_error),
            "dhash",
        ).withColumnsRenamed({"video_id": "vid", "frame_idx": "f"}),
    )
    cnts = sigs.groupBy("vid").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_decoded")
    )
    if n_frames is not None:
        cnts = cnts.select(
            "vid",
            F.when(
                F.assert_true(
                    F.col("n_decoded") == F.lit(int(n_frames)),
                    F.lit("decoded frame count differs from declared n_frames"),
                ).isNull(),
                F.col("n_decoded"),
            ).alias("n_decoded"),
        )
    a, b = sigs.alias("a"), sigs.alias("b")
    matches = a.join(
        b,
        (F.col("a.f") == F.col("b.f"))
        & (F.col("a.dhash") == F.col("b.dhash"))
        & (F.col("a.vid") < F.col("b.vid")),
    ).select(
        F.col("a.vid").alias("vid_a"), F.col("b.vid").alias("vid_b")
    )
    # per-video counts are one row per video — broadcast both lookups
    return (
        matches.groupBy("vid_a", "vid_b")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_match"))
        .join(
            F.broadcast(cnts.withColumnRenamed("n_decoded", "n_a")),
            F.col("vid_a") == F.col("vid"),
        )
        .drop("vid")
        .join(
            F.broadcast(cnts.withColumnRenamed("n_decoded", "n_b")),
            F.col("vid_b") == F.col("vid"),
        )
        .drop("vid")
        .withColumn(
            "match_fraction",
            F.round(F.col("n_match") / F.greatest("n_a", "n_b"), 6),
        )
        .filter(F.col("match_fraction") >= min_match_fraction)
        .select("vid_a", "vid_b", "n_match", "match_fraction")
    )


def render_gradient_images_distributed(
    spark, n: int, width: int = 18, height: int = 16
) -> "DataFrame":
    """EXECUTOR-SIDE gradient-image synthesis from an id range
    (``mapInPandas`` over ``spark.range``): the same twin structure as
    :func:`synthetic_gradient_images` (odd ids are luminance-identical
    channel-shifted twins), but payloads render in parallel on
    executors — media fixtures (and, by the same shape, any
    programmatic media ingest) at corpus scale without ever
    materializing rows on the driver. Feeds :func:`image_dhash` /
    ``hamming_pairs_64`` unchanged.

    The pixel law extends the fixture law with a second modulus and a
    g×c cross-term,
        v = 3 + (g*37 + (g%251)*29 + (g*(c+1)) % 241 + c*c*11 + r*7) % 237,
    for two scale reasons: the bare ``g*37 % 237`` repeats every 237
    patterns (identical-image mega-cliques at probe scale), and
    without a g-dependent COLUMN term every pattern shares nearly the
    same horizontal-gradient structure, collapsing dHash entropy so
    banding buckets exceed any cap. The cross-term gives each pattern
    an individually-shaped column profile — the diverse-corpus case a
    probe should model; low-entropy boilerplate corpora are the
    ``max_bucket_size`` valve's job, exercised separately.
    """

    def batches(it: Iterator) -> Iterator:
        import numpy as np
        import pandas as pd

        r_idx = np.arange(height).reshape(-1, 1)
        c_idx = np.arange(width).reshape(1, -1)
        for pdf in it:
            ids, payloads = [], []
            for i in pdf["media_id"]:
                g = int(i) // 2
                v = 3 + (
                    g * 37
                    + (g % 251) * 29
                    + (g * (c_idx + 1)) % 241
                    + c_idx * c_idx * 11
                    + r_idx * 7
                ) % 237
                px = np.zeros((height, width, 3), dtype=np.uint8)
                if i % 2 == 0:
                    px[:, :, :] = v[:, :, None]
                else:
                    px[:, :, 0] = v + 3
                    px[:, :, 1] = v
                    px[:, :, 2] = v - 3
                ids.append(int(i))
                payloads.append(ppm_bytes(px))
            yield pd.DataFrame({"media_id": ids, "payload": payloads})

    base = spark.range(n).select(F.col("id").alias("media_id"))
    schema = T.StructType(
        [
            T.StructField("media_id", T.LongType(), False),
            T.StructField("payload", T.BinaryType()),
        ]
    )
    return base.mapInPandas(batches, schema)


RESIZE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("payload", T.BinaryType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
    ]
)


def image_resize_blockmean(
    media: "DataFrame",
    out_width: int,
    out_height: int,
    on_error: str = "raise",
) -> "DataFrame":
    """REAL image RESIZE over ``mapInPandas``: P6-PPM decode →
    block-mean downscale to ``out_width × out_height`` (channelwise
    means over near-equal pixel bands, rounded half-up to uint8) →
    re-encoded P6-PPM payload. The thumbnail/normalize stage of an
    image-corpus pipeline; output rows feed :func:`image_dhash`,
    :func:`image_features` or any other decoder unchanged.

    Rows explode nothing and shuffle nothing — a narrow Arrow-batched
    map, embarrassingly parallel at corpus scale. ``on_error="skip"``
    quarantines undecodable payloads, nulls included; ``"raise"``
    fails loud on nulls too (see :func:`image_dhash`).
    """
    if on_error not in ("raise", "skip"):
        raise ValueError(f"on_error must be 'raise' or 'skip': {on_error!r}")

    def batches(it: Iterator) -> Iterator:
        import numpy as np
        import pandas as pd

        for pdf in it:
            out = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                if payload is None:
                    if on_error == "skip":
                        continue
                    raise ValueError(f"null payload for media_id={mid}")
                try:
                    px = decode_image(bytes(payload)).astype(np.float64)
                except Exception:
                    if on_error == "skip":
                        continue
                    raise
                h, w, _ = px.shape
                rb = np.array_split(np.arange(h), out_height)
                cb = np.array_split(np.arange(w), out_width)
                small = np.zeros((out_height, out_width, 3), dtype=np.uint8)
                for r, rows_ in enumerate(rb):
                    for c, cols in enumerate(cb):
                        m = px[np.ix_(rows_, cols)].mean(axis=(0, 1))
                        small[r, c] = np.floor(m + 0.5).astype(np.uint8)
                out.append((mid, ppm_bytes(small), out_width, out_height))
            yield pd.DataFrame(
                out, columns=["media_id", "payload", "width", "height"]
            )

    return media.mapInPandas(batches, RESIZE_SCHEMA)
