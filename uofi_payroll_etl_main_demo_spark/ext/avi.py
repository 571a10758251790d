"""Minimal AVI (RIFF) MJPEG demux + mux — video from CONTAINER bytes.

Closes the round-6 gap where video operators consumed pre-extracted
frame tables (ext/multimodal.py synthetic_*_videos): with the baseline
JPEG decoder in-tree (ext/jpeg.py), an MJPEG/AVI demuxer makes the
video path end-to-end real from bytes, like images and audio are.
MJPEG-in-AVI is the simplest REAL video container (each frame is an
independent baseline JPEG inside a ``00dc`` chunk — no inter-frame
prediction), which is exactly what a pure-Python executor-side decode
can afford; inter-frame codecs stay behind loud guards (the module
raises on any non-MJPG stream rather than guessing).

Layout written/read (the OpenDML-free classic AVI RIFF form):

    RIFF 'AVI '
      LIST 'hdrl'
        'avih'  MainAVIHeader   (56 bytes, 14 LE DWORDs)
        LIST 'strl'
          'strh' AVIStreamHeader ('vids'/'MJPG', 56 bytes)
          'strf' BITMAPINFOHEADER (40 bytes, biCompression='MJPG')
      LIST 'movi'
        '00dc' <jpeg bytes>     (one chunk per frame, word-aligned)
        ...
      'idx1'  (ckid, flags, offset, size) per frame

The demuxer walks chunks strictly (sizes validated against the
payload; truncation raises), verifies the stream genuinely declares
MJPG in BOTH strh.fccHandler and strf.biCompression, and returns the
``00dc``/``00db`` frame payloads in stream order. The muxer exists for
fixtures and tests; demux(mux(frames)) == frames is pinned, and a
HAND-BUILT spec stream (independent of the muxer) pins the demuxer so
the two cannot share a wrong law (the test_jpeg.py methodology).

Spark surface: :func:`video_frames_from_avi` turns a (video_id,
payload) container table into the (video_id, frame_idx, payload)
frame table every existing video operator consumes — demux is a
per-row executor-side transform over Arrow batches (embarrassingly
parallel, no shuffle), so keyframes/near-dup run from container bytes
with no new distributed machinery.

No reference parity: the reference pipeline has no media surface;
extension scope (SURVEY.md §2.9 multimodal family).
"""

from __future__ import annotations

import struct
from typing import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import types as T

__all__ = [
    "avi_mjpeg_bytes",
    "demux_avi_mjpeg",
    "video_frames_from_avi",
]


def avi_mjpeg_bytes(
    frames: "list[bytes]",
    width: int,
    height: int,
    fps: int = 10,
) -> bytes:
    """Assemble JPEG frame payloads into a classic MJPEG AVI container
    (headers + movi + idx1). Frames must share one geometry — MJPEG
    players assume it from the stream header."""
    if not frames:
        raise ValueError("an AVI needs at least one frame")

    def chunk(tag: bytes, data: bytes) -> bytes:
        pad = b"\x00" if len(data) % 2 else b""
        return tag + struct.pack("<I", len(data)) + data + pad

    def lst(kind: bytes, data: bytes) -> bytes:
        return chunk(b"LIST", kind + data)

    usec_per_frame = 1_000_000 // fps
    max_bytes = max(len(f) for f in frames)
    avih = struct.pack(
        "<14I",
        usec_per_frame,          # dwMicroSecPerFrame
        max_bytes * fps,         # dwMaxBytesPerSec
        0,                       # dwPaddingGranularity
        0x10,                    # dwFlags: AVIF_HASINDEX
        len(frames),             # dwTotalFrames
        0,                       # dwInitialFrames
        1,                       # dwStreams
        max_bytes,               # dwSuggestedBufferSize
        width,
        height,
        0, 0, 0, 0,              # dwReserved
    )
    strh = struct.pack(
        "<4s4sIHHIIIIIIii4H",
        b"vids",                 # fccType
        b"MJPG",                 # fccHandler
        0,                       # dwFlags
        0, 0,                    # wPriority, wLanguage
        0,                       # dwInitialFrames
        1,                       # dwScale
        fps,                     # dwRate (rate/scale = fps)
        0,                       # dwStart
        len(frames),             # dwLength
        max_bytes,               # dwSuggestedBufferSize
        -1,                      # dwQuality (default)
        0,                       # dwSampleSize (0: varying)
        0, 0, width, height,     # rcFrame
    )
    strf = struct.pack(
        "<IiiHH4sIiiII",
        40,                      # biSize
        width,
        height,
        1,                       # biPlanes
        24,                      # biBitCount
        b"MJPG",                 # biCompression
        width * height * 3,      # biSizeImage
        0, 0, 0, 0,
    )
    hdrl = lst(
        b"hdrl",
        chunk(b"avih", avih)
        + lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)),
    )
    movi_chunks, offsets = [], []
    off = 4  # idx1 offsets are relative to the start of 'movi' fourcc
    for f in frames:
        offsets.append(off)
        ck = chunk(b"00dc", f)
        movi_chunks.append(ck)
        off += len(ck)
    movi = lst(b"movi", b"".join(movi_chunks))
    idx1 = chunk(
        b"idx1",
        b"".join(
            b"00dc" + struct.pack("<III", 0x10, o, len(f))  # AVIIF_KEYFRAME
            for o, f in zip(offsets, frames)
        ),
    )
    body = b"AVI " + hdrl + movi + idx1
    return b"RIFF" + struct.pack("<I", len(body)) + body


def _avi_chunks(data: bytes, start: int, end: int):
    """Yield (tag, payload_start, payload_size) for each chunk between
    ``start`` and ``end``; raises on truncation."""
    i = start
    while i + 8 <= end:
        tag = data[i : i + 4]
        (size,) = struct.unpack("<I", data[i + 4 : i + 8])
        if i + 8 + size > end:
            raise ValueError(
                f"truncated AVI chunk {tag!r} at {i} (size {size})"
            )
        yield tag, i + 8, size
        i += 8 + size + (size % 2)  # word-aligned


def demux_avi_mjpeg(payload: bytes) -> "list[bytes]":
    """JPEG frame payloads, in stream order, from an MJPEG AVI. Raises
    ``ValueError`` on a non-AVI container or a stream whose declared
    codec is not MJPG — decoding another codec's chunks as JPEG would
    produce garbage, loudly refusing is the only honest move (same
    posture as the unsupported-format guards in ext/jpeg.py)."""
    if (
        len(payload) < 12
        or payload[:4] != b"RIFF"
        or payload[8:12] != b"AVI "
    ):
        raise ValueError("not a RIFF/AVI stream")
    (riff_size,) = struct.unpack("<I", payload[4:8])
    end = min(8 + riff_size, len(payload))
    handler = compression = vids_stream = None
    # (stream_no, bytes) for every video-ish movi chunk; the vids
    # stream's NUMBER is its strl position within hdrl, so an AVI that
    # declares audio first tags video chunks '01dc' — matching '00dc'
    # blindly would silently return zero frames there
    tagged: "list[tuple[int, bytes]]" = []

    def _movi_chunk(t: bytes, body: bytes) -> None:
        if t[2:4] in (b"dc", b"db") and t[:2].isdigit():
            tagged.append((int(t[:2]), body))

    stream_no = -1
    for tag, p, size in _avi_chunks(payload, 12, end):
        if tag != b"LIST":
            continue
        kind = payload[p : p + 4]
        if kind == b"hdrl":
            for t2, p2, s2 in _avi_chunks(payload, p + 4, p + size):
                if t2 == b"LIST" and payload[p2 : p2 + 4] == b"strl":
                    stream_no += 1
                    # scope strh AND strf to THIS strl: a later audio
                    # stream's strf must not clobber the video codec
                    is_vids, strl_strf, strl_handler = False, None, None
                    for t3, p3, s3 in _avi_chunks(
                        payload, p2 + 4, p2 + s2
                    ):
                        if t3 == b"strh" and s3 >= 8:
                            if payload[p3 : p3 + 4] == b"vids":
                                is_vids = True
                                strl_handler = payload[p3 + 4 : p3 + 8]
                        elif t3 == b"strf" and s3 >= 20:
                            strl_strf = payload[p3 + 16 : p3 + 20]
                    # first COMPLETE vids strl (strh AND strf) wins;
                    # its position is the stream number its movi
                    # chunks carry. A vids strl missing its strf falls
                    # through to a later complete video stream instead
                    # of latching an undecodable one.
                    if (
                        is_vids
                        and strl_strf is not None
                        and vids_stream is None
                    ):
                        vids_stream = stream_no
                        handler = strl_handler
                        compression = strl_strf
        elif kind == b"movi":
            for t2, p2, s2 in _avi_chunks(payload, p + 4, p + size):
                # {nn}dc = compressed, {nn}db = uncompressed naming
                # some muxers still use for MJPEG; interleaving muxers
                # wrap runs of chunks in one level of 'LIST rec '
                if t2 == b"LIST" and payload[p2 : p2 + 4] == b"rec ":
                    for t3, p3, s3 in _avi_chunks(
                        payload, p2 + 4, p2 + s2
                    ):
                        _movi_chunk(t3, payload[p3 : p3 + s3])
                else:
                    _movi_chunk(t2, payload[p2 : p2 + s2])
    if vids_stream is None or compression is None:
        raise ValueError("no video stream header (strh/strf) found")
    if handler != b"MJPG" or compression != b"MJPG":
        raise ValueError(
            f"unsupported video codec {handler!r}/{compression!r}; "
            "only MJPG streams decode here"
        )
    return [body for no, body in tagged if no == vids_stream]


FRAMES_SCHEMA = T.StructType(
    [
        T.StructField("video_id", T.LongType(), False),
        T.StructField("frame_idx", T.IntegerType(), False),
        T.StructField("payload", T.BinaryType(), False),
    ]
)


def video_frames_from_avi(
    videos: DataFrame,
    id_col: str = "video_id",
    payload_col: str = "payload",
    on_error: str = "raise",
) -> DataFrame:
    """(video_id, frame_idx, payload) frame table from (video_id,
    avi_bytes) container rows — the bridge that lets every existing
    per-frame video operator (keyframes, near-dup, dHash) run from
    REAL container bytes. Demux is per-row and executor-side
    (mapInPandas over Arrow batches): no shuffle, scales with
    rows/executors. ``on_error="skip"`` quarantines undecodable
    containers (and null payloads) instead of failing the task; the
    default keeps every failure loud."""
    if on_error not in ("raise", "skip"):
        raise ValueError(f"on_error must be 'raise' or 'skip': {on_error!r}")

    def batches(it: Iterator) -> Iterator:
        import pandas as pd

        for pdf in it:
            out = {"video_id": [], "frame_idx": [], "payload": []}
            for vid, payload in zip(pdf[id_col], pdf[payload_col]):
                if payload is None:
                    if on_error == "skip":
                        continue
                    raise ValueError(f"null payload for {id_col}={vid}")
                try:
                    frames = demux_avi_mjpeg(bytes(payload))
                except Exception:
                    if on_error == "skip":
                        continue
                    raise
                for i, f in enumerate(frames):
                    out["video_id"].append(vid)
                    out["frame_idx"].append(i)
                    out["payload"].append(f)
            yield pd.DataFrame(out).astype(
                {"video_id": "int64", "frame_idx": "int32"}
            )

    return videos.select(id_col, payload_col).mapInPandas(
        batches, FRAMES_SCHEMA
    )
