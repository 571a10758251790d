"""MJPEG/AVI container: mux → demux roundtrip, hand-built spec-stream
pins (the test_jpeg.py methodology — the demuxer must read a stream
the muxer did NOT write, so the two cannot share a wrong law), loud
codec guards, and the end-to-end video path from container bytes.
"""

from __future__ import annotations

import struct

import pytest
from pyspark.sql import functions as F

from uofi_payroll_etl_main_demo_spark.ext.avi import (
    avi_mjpeg_bytes,
    demux_avi_mjpeg,
    video_frames_from_avi,
)
from uofi_payroll_etl_main_demo_spark.ext.jpeg import jpeg_bytes
from uofi_payroll_etl_main_demo_spark.ext.multimodal import (
    _scene_frame_pixels,
    synthetic_scene_videos,
    synthetic_scene_videos_avi,
    video_keyframes,
)


def _jpeg_frames(n=4, w=18, h=16):
    return [
        jpeg_bytes(_scene_frame_pixels(0, f, 2, w, h), quality=95)
        for f in range(n)
    ]


def test_mux_demux_roundtrip():
    frames = _jpeg_frames(5)
    avi = avi_mjpeg_bytes(frames, 18, 16, fps=10)
    assert demux_avi_mjpeg(avi) == frames
    # odd-length frame payloads exercise the word-alignment padding
    odd = [f + b"\xff\xd9"[:1] * (1 - len(f) % 2) for f in frames]
    assert demux_avi_mjpeg(avi_mjpeg_bytes(odd, 18, 16)) == odd


def test_demux_hand_built_spec_stream():
    """A minimal AVI assembled field-by-field from the RIFF/AVI spec,
    independent of avi_mjpeg_bytes."""
    f0, f1 = b"\xff\xd8AA\xff\xd9", b"\xff\xd8BBB\xff\xd9"  # fake JPEGs

    def ck(tag, data):
        return tag + struct.pack("<I", len(data)) + data + (
            b"\x00" if len(data) % 2 else b""
        )

    strh = (
        b"vids" + b"MJPG" + struct.pack("<IHHIIIIIIii", 0, 0, 0, 0, 1, 5,
                                        0, 2, 64, -1, 0)
        + struct.pack("<4H", 0, 0, 18, 16)
    )
    strf = struct.pack(
        "<IiiHH4sIiiII", 40, 18, 16, 1, 24, b"MJPG", 18 * 16 * 3, 0, 0, 0, 0
    )
    hdrl = ck(
        b"LIST",
        b"hdrl"
        + ck(b"avih", struct.pack("<14I", *([100000, 0, 0, 0x10, 2, 0, 1,
                                             64, 18, 16, 0, 0, 0, 0])))
        + ck(b"LIST", b"strl" + ck(b"strh", strh) + ck(b"strf", strf)),
    )
    movi = ck(b"LIST", b"movi" + ck(b"00dc", f0) + ck(b"00db", f1))
    body = b"AVI " + hdrl + movi
    avi = b"RIFF" + struct.pack("<I", len(body)) + body
    assert demux_avi_mjpeg(avi) == [f0, f1]


def test_demux_guards_raise_loudly():
    frames = _jpeg_frames(2)
    avi = bytearray(avi_mjpeg_bytes(frames, 18, 16))
    with pytest.raises(ValueError, match="not a RIFF/AVI"):
        demux_avi_mjpeg(b"RIFF\x04\x00\x00\x00WAVE")
    # truncation inside a chunk
    with pytest.raises(ValueError, match="truncated"):
        demux_avi_mjpeg(bytes(avi[:-6]))
    # a non-MJPG codec must refuse, not decode garbage
    xvid = bytearray(avi)
    pos = xvid.find(b"MJPG")
    xvid[pos : pos + 4] = b"XVID"  # strh.fccHandler
    with pytest.raises(ValueError, match="unsupported video codec"):
        demux_avi_mjpeg(bytes(xvid))
    # a stream with headers missing entirely
    with pytest.raises(ValueError, match="no video stream header"):
        demux_avi_mjpeg(b"RIFF" + struct.pack("<I", 4) + b"AVI ")


def test_demux_ignores_audio_stream_strf():
    """A second (audio) strl must not clobber the VIDEO codec check:
    its strf is a WAVEFORMATEX, whose bytes 16:20 are not 'MJPG'."""
    frames = _jpeg_frames(2)
    avi = avi_mjpeg_bytes(frames, 18, 16)
    # splice an 'auds' strl (strh fccType='auds', strf=WAVEFORMATEX-
    # shaped 30 bytes) after the vids strl inside hdrl
    def ck(tag, data):
        return tag + struct.pack("<I", len(data)) + data + (
            b"\x00" if len(data) % 2 else b""
        )

    auds_strh = (
        b"auds" + b"\x00" * 4
        + struct.pack("<IHHIIIIIIii", 0, 0, 0, 0, 1, 8000, 0, 100, 0, -1, 1)
        + struct.pack("<4H", 0, 0, 0, 0)
    )
    auds_strl = ck(
        b"LIST", b"strl" + ck(b"strh", auds_strh) + ck(b"strf", b"\x55" * 30)
    )
    # rebuild: insert the auds strl right before hdrl's end
    hdrl_at = avi.index(b"LIST", 12)
    (hdrl_size,) = struct.unpack("<I", avi[hdrl_at + 4 : hdrl_at + 8])
    hdrl_body = avi[hdrl_at + 8 : hdrl_at + 8 + hdrl_size]
    new_body = hdrl_body + auds_strl
    rebuilt = (
        avi[:hdrl_at]
        + b"LIST"
        + struct.pack("<I", len(new_body))
        + new_body
        + avi[hdrl_at + 8 + hdrl_size :]
    )
    riff_body_len = len(rebuilt) - 8
    rebuilt = rebuilt[:4] + struct.pack("<I", riff_body_len) + rebuilt[8:]
    assert demux_avi_mjpeg(rebuilt) == frames


def test_demux_audio_first_avi_reads_01dc_frames():
    """An AVI that declares the AUDIO stream first numbers the video
    chunks '01dc' (stream number = strl position). The demuxer must
    return THOSE frames — matching '00dc' blindly would pass the codec
    check and silently return an empty list — and must not pick up the
    audio stream's '00wb' chunks."""
    f0, f1 = b"\xff\xd8AA\xff\xd9", b"\xff\xd8BBB\xff\xd9"

    def ck(tag, data):
        return tag + struct.pack("<I", len(data)) + data + (
            b"\x00" if len(data) % 2 else b""
        )

    auds_strh = (
        b"auds" + b"\x00" * 4
        + struct.pack("<IHHIIIIIIii", 0, 0, 0, 0, 1, 8000, 0, 100, 0, -1, 1)
        + struct.pack("<4H", 0, 0, 0, 0)
    )
    vids_strh = (
        b"vids" + b"MJPG"
        + struct.pack("<IHHIIIIIIii", 0, 0, 0, 0, 1, 5, 0, 2, 64, -1, 0)
        + struct.pack("<4H", 0, 0, 18, 16)
    )
    vids_strf = struct.pack(
        "<IiiHH4sIiiII", 40, 18, 16, 1, 24, b"MJPG", 18 * 16 * 3, 0, 0, 0, 0
    )
    hdrl = ck(
        b"LIST",
        b"hdrl"
        + ck(b"avih", struct.pack("<14I", *([100000, 0, 0, 0x10, 2, 0, 2,
                                             64, 18, 16, 0, 0, 0, 0])))
        + ck(b"LIST", b"strl" + ck(b"strh", auds_strh)
             + ck(b"strf", b"\x55" * 30))
        + ck(b"LIST", b"strl" + ck(b"strh", vids_strh)
             + ck(b"strf", vids_strf)),
    )
    movi = ck(
        b"LIST",
        b"movi"
        + ck(b"00wb", b"\x80" * 10)  # audio samples, stream 0
        + ck(b"01dc", f0)
        + ck(b"00wb", b"\x80" * 10)
        + ck(b"01db", f1),
    )
    body = b"AVI " + hdrl + movi
    avi = b"RIFF" + struct.pack("<I", len(body)) + body
    assert demux_avi_mjpeg(avi) == [f0, f1]


def test_demux_skips_incomplete_vids_strl():
    """A vids strl with strh but NO strf is undecodable — the demuxer
    must fall through to a later COMPLETE vids stream (stream 1 here)
    instead of latching the broken one and raising."""
    f0 = b"\xff\xd8AA\xff\xd9"

    def ck(tag, data):
        return tag + struct.pack("<I", len(data)) + data + (
            b"\x00" if len(data) % 2 else b""
        )

    broken_strh = (
        b"vids" + b"MJPG"
        + struct.pack("<IHHIIIIIIii", 0, 0, 0, 0, 1, 5, 0, 1, 64, -1, 0)
        + struct.pack("<4H", 0, 0, 18, 16)
    )
    good_strf = struct.pack(
        "<IiiHH4sIiiII", 40, 18, 16, 1, 24, b"MJPG", 18 * 16 * 3, 0, 0, 0, 0
    )
    hdrl = ck(
        b"LIST",
        b"hdrl"
        + ck(b"avih", struct.pack("<14I", *([100000, 0, 0, 0x10, 1, 0, 2,
                                             64, 18, 16, 0, 0, 0, 0])))
        + ck(b"LIST", b"strl" + ck(b"strh", broken_strh))  # no strf
        + ck(b"LIST", b"strl" + ck(b"strh", broken_strh)
             + ck(b"strf", good_strf)),
    )
    movi = ck(b"LIST", b"movi" + ck(b"01dc", f0))
    body = b"AVI " + hdrl + movi
    avi = b"RIFF" + struct.pack("<I", len(body)) + body
    assert demux_avi_mjpeg(avi) == [f0]


def test_demux_reads_rec_grouped_movi():
    """Interleaving muxers wrap movi chunks in 'LIST rec ' groups —
    the demuxer must read through one level of grouping."""
    f0, f1, f2 = b"\xff\xd8A\xff\xd9", b"\xff\xd8BB\xff\xd9", b"\xff\xd8C\xff\xd9"

    def ck(tag, data):
        return tag + struct.pack("<I", len(data)) + data + (
            b"\x00" if len(data) % 2 else b""
        )

    strh = (
        b"vids" + b"MJPG"
        + struct.pack("<IHHIIIIIIii", 0, 0, 0, 0, 1, 5, 0, 3, 64, -1, 0)
        + struct.pack("<4H", 0, 0, 18, 16)
    )
    strf = struct.pack(
        "<IiiHH4sIiiII", 40, 18, 16, 1, 24, b"MJPG", 18 * 16 * 3, 0, 0, 0, 0
    )
    hdrl = ck(
        b"LIST",
        b"hdrl"
        + ck(b"avih", struct.pack("<14I", *([100000, 0, 0, 0x10, 3, 0, 1,
                                             64, 18, 16, 0, 0, 0, 0])))
        + ck(b"LIST", b"strl" + ck(b"strh", strh) + ck(b"strf", strf)),
    )
    movi = ck(
        b"LIST",
        b"movi"
        + ck(b"LIST", b"rec " + ck(b"00dc", f0) + ck(b"00dc", f1))
        + ck(b"00dc", f2),
    )
    body = b"AVI " + hdrl + movi
    avi = b"RIFF" + struct.pack("<I", len(body)) + body
    assert demux_avi_mjpeg(avi) == [f0, f1, f2]


def test_video_frames_from_avi_distributed(spark):
    """The Spark bridge reproduces every (video_id, frame_idx, payload)
    row exactly; skip mode quarantines corrupt containers + nulls."""
    avis = synthetic_scene_videos_avi(spark, n_videos=4)
    got = sorted(
        (r["video_id"], r["frame_idx"], bytes(r["payload"]))
        for r in video_frames_from_avi(avis).collect()
    )
    want = []
    for r in avis.collect():
        for i, f in enumerate(demux_avi_mjpeg(bytes(r["payload"]))):
            want.append((r["video_id"], i, f))
    assert got == sorted(want) and len(got) == 4 * 16
    corrupt = spark.createDataFrame(
        [(100, b"not an avi"), (101, None)],
        "video_id bigint, payload binary",
    )
    mixed = avis.unionByName(corrupt)
    assert video_frames_from_avi(mixed, on_error="skip").count() == 4 * 16
    with pytest.raises(Exception):
        video_frames_from_avi(mixed, on_error="raise").count()


def test_keyframes_from_container_match_lossless_twin(spark):
    """End-to-end: demuxed AVI frames → JPEG decode → dHash → keyframes
    equals the scene starts — and the PPM (lossless) twin agrees on
    the keyframe SET, pinning the q=95 margin arithmetic."""
    avis = synthetic_scene_videos_avi(spark, n_videos=8)
    got = sorted(
        (r["video_id"], r["frame_idx"])
        for r in video_keyframes(
            video_frames_from_avi(avis), min_hamming=8
        ).collect()
    )
    lossless = sorted(
        (r["video_id"], r["frame_idx"])
        for r in video_keyframes(
            synthetic_scene_videos(spark, n_videos=8), min_hamming=8
        ).collect()
    )
    want = sorted((v, s * 4) for v in range(8) for s in range(4))
    assert got == lossless == want
