"""MJPEG/AVI container codec (VERDICT r13 #6): fixtures assembled by
encode_avi_mjpeg round-trip through the header parser and the frame
iterator, sampled frames decode to pixels via the round-13 JPEG codec,
the Spark mapInPandas sampling path is real end-to-end, and non-MJPEG
codecs keep an honest fail-fast."""

from __future__ import annotations

import numpy as np
import pytest

from nlu_data_warehouse_project_spark.operators.jpeg import decode_jpeg, encode_jpeg
from nlu_data_warehouse_project_spark.operators.video import (
    decode_avi_frame,
    encode_avi_mjpeg,
    iter_mjpeg_frames,
    parse_avi_header,
)

W, H, FPS = 16, 8, 2
# six solid-color frames — distinguishable after DCT round-trip
COLORS = [(200, 30, 30), (30, 200, 30), (30, 30, 200),
          (200, 200, 30), (30, 200, 200), (120, 120, 120)]


def _avi() -> bytes:
    frames = [encode_jpeg(W, H, 3, bytes(c * (W * H))) for c in COLORS]
    return encode_avi_mjpeg(W, H, FPS, frames)


def test_header_parse():
    hdr = parse_avi_header(_avi())
    assert hdr["format"] == "avi" and hdr["codec"] == "MJPG"
    assert (hdr["width"], hdr["height"]) == (W, H)
    assert hdr["n_frames"] == len(COLORS)
    assert hdr["fps"] == FPS
    assert hdr["duration_ms"] == len(COLORS) * 1000 // FPS  # 3000
    # non-AVI payloads classify as None, never throw
    assert parse_avi_header(b"RIFF\x10\x00\x00\x00WAVEfmt ") is None
    assert parse_avi_header(b"not a container") is None
    assert parse_avi_header(None) is None


def test_av_sniffer_sees_avi():
    from nlu_data_warehouse_project_spark.operators.multimodal import parse_av_header

    assert parse_av_header(_avi()) == ("avi", 3000)


def test_frames_roundtrip_through_jpeg():
    payload = _avi()
    frames = list(iter_mjpeg_frames(payload))
    assert [i for i, _ in frames] == list(range(len(COLORS)))
    for i, jpeg_bytes in frames:
        img = decode_jpeg(jpeg_bytes)
        assert (img["width"], img["height"], img["channels"]) == (W, H, 3)
        px = np.frombuffer(img["pixels"], dtype=np.uint8).astype(np.float64).reshape(H, W, 3)
        got = px.mean(axis=(0, 1))
        want = np.array(COLORS[i], dtype=np.float64)
        assert np.abs(got - want).max() < 12  # DCT + chroma rounding
    # random access decodes the same pixels
    one = decode_avi_frame(payload, 3)
    assert (one["width"], one["height"]) == (W, H)
    with pytest.raises(IndexError):
        decode_avi_frame(payload, len(COLORS))


def test_non_mjpeg_codec_fails_fast():
    payload = bytearray(_avi())
    at = payload.index(b"vidsMJPG")
    payload[at + 4 : at + 8] = b"H264"
    with pytest.raises(NotImplementedError, match="H264|MJPEG"):
        list(iter_mjpeg_frames(bytes(payload)))
    # the header parser still reports the codec without throwing
    assert parse_avi_header(bytes(payload))["codec"] == "H264"


def test_sample_frames_spark(spark):
    """The mapInPandas path: every_ms=1000 at 2 fps picks frames
    0/2/4, each payload decodable downstream, and the sampled frames
    feed extract_features' real-pixel path."""
    from nlu_data_warehouse_project_spark.operators.multimodal import (
        MEDIA_SCHEMA, attach_meta, extract_features, sample_frames,
    )

    df = spark.createDataFrame([(7, _avi(), None)], MEDIA_SCHEMA)
    rows = sample_frames(df, every_ms=1000).collect()
    assert [(r["frame_idx"], r["frame_ts_ms"]) for r in rows] == [
        (0, 0), (2, 1000), (4, 2000)
    ]
    for r in rows:
        img = decode_jpeg(bytes(r["frame_payload"]))
        assert (img["width"], img["height"]) == (W, H)

    # sampled frames ARE media rows: wrap and featurize real pixels
    from pyspark.sql import functions as F

    frames = sample_frames(df, every_ms=1000).select(
        F.col("frame_idx").cast("long").alias("media_id"),
        F.col("frame_payload").alias("payload"),
    )
    feat = extract_features(
        attach_meta(frames, media_type="image", sniff=True),
        use_fake_extractor=False,
    ).collect()
    assert len(feat) == 3
    for r in feat:
        assert r["feature"][0] == float(W) and r["feature"][1] == float(H)

    # sub-frame-interval sampling collapses to distinct frames
    dense = sample_frames(df, every_ms=100).collect()
    assert [r["frame_idx"] for r in dense] == list(range(len(COLORS)))
    assert [r["frame_ts_ms"] for r in dense] == [0, 500, 1000, 1500, 2000, 2500]


DW, DH = 10, 6  # 10*3=30 bytes/row -> stride 32: padding exercised


def _dib_frames(n=4):
    """Deterministic per-pixel gradients — a flip or BGR/RGB swap
    cannot go unnoticed the way it would on solid colors."""
    return [
        np.fromfunction(
            lambda y, x, c: (x * 7 + y * 13 + c * 51 + f * 31) % 256,
            (DH, DW, 3),
        ).astype(np.uint8)
        for f in range(n)
    ]


def _dib_avi(frames=None) -> bytes:
    from nlu_data_warehouse_project_spark.operators.video import encode_avi_dib

    return encode_avi_dib(DW, DH, FPS, frames if frames is not None else _dib_frames())


def test_dib_avi_header_and_bitexact_roundtrip():
    from nlu_data_warehouse_project_spark.operators.video import iter_dib_frames

    frames = _dib_frames()
    payload = _dib_avi(frames)
    hdr = parse_avi_header(payload)
    assert hdr["codec"] == "DIB" and hdr["compression"] == 0
    assert hdr["bit_count"] == 24
    assert (hdr["width"], hdr["height"], hdr["n_frames"]) == (DW, DH, len(frames))
    got = list(iter_dib_frames(payload))
    assert [i for i, _ in got] == list(range(len(frames)))
    for (_, rgb), want in zip(got, frames):
        assert np.array_equal(rgb, want)  # lossless: bit-exact
    # random access through the shared decode contract
    one = decode_avi_frame(payload, 2)
    assert (one["width"], one["height"], one["channels"]) == (DW, DH, 3)
    assert one["pixels"] == frames[2].tobytes()
    with pytest.raises(IndexError):
        decode_avi_frame(payload, len(frames))


def test_dib_avi_fail_fasts():
    from nlu_data_warehouse_project_spark.operators.video import (
        encode_avi_dib, iter_dib_frames,
    )

    with pytest.raises(ValueError, match="uint8"):
        encode_avi_dib(DW, DH, FPS, [np.zeros((DH, DW, 3), np.float64)])
    payload = bytearray(_dib_avi())
    # corrupt the strf bit depth to 32: decoder must refuse, not guess
    at = payload.index(b"strf") + 8
    payload[at + 14:at + 16] = (32).to_bytes(2, "little")
    with pytest.raises(NotImplementedError, match="biBitCount=32"):
        list(iter_dib_frames(bytes(payload)))
    # a short movi chunk is corruption, not a frame
    good = _dib_avi()
    stride = (DW * 3 + 3) & ~3
    bad = good.replace(
        b"00dc" + (stride * DH).to_bytes(4, "little"),
        b"00dc" + (stride * DH - 4).to_bytes(4, "little"), 1,
    )
    with pytest.raises(ValueError, match="chunk size"):
        list(iter_dib_frames(bad))
    # MJPEG iterator refuses a DIB stream and vice versa
    with pytest.raises(NotImplementedError, match="MJPEG only"):
        list(iter_mjpeg_frames(good))
    with pytest.raises(ValueError, match="not uncompressed DIB"):
        list(iter_dib_frames(_avi()))


def test_sample_frames_dib_spark(spark):
    """DIB sampling plumbs end-to-end: selected frames re-wrap as
    LOSSLESS PNG, bit-exact after the downstream PNG decode."""
    from nlu_data_warehouse_project_spark.operators.multimodal import (
        MEDIA_SCHEMA, decode_png, sample_frames,
    )

    frames = _dib_frames()
    df = spark.createDataFrame([(9, _dib_avi(frames), None)], MEDIA_SCHEMA)
    rows = sample_frames(df, every_ms=1000).collect()
    assert [(r["frame_idx"], r["frame_ts_ms"]) for r in rows] == [(0, 0), (2, 1000)]
    for r in rows:
        img = decode_png(bytes(r["frame_payload"]))
        assert (img["width"], img["height"], img["channels"]) == (DW, DH, 3)
        assert img["pixels"] == frames[r["frame_idx"]].tobytes()


def test_sample_frames_non_avi_fails_fast(spark):
    from nlu_data_warehouse_project_spark.operators.multimodal import (
        MEDIA_SCHEMA, sample_frames,
    )

    df = spark.createDataFrame([(1, b"\x00\x00\x00\x18ftypisom....", None)], MEDIA_SCHEMA)
    with pytest.raises(Exception, match="MJPEG/AVI"):
        sample_frames(df).collect()


# ---------------------------------------------------------------------------
# round 16: deterministic image resize (decode -> numpy -> lossless PNG)
# ---------------------------------------------------------------------------

def test_resize_image_array_kernels():
    from nlu_data_warehouse_project_spark.operators.multimodal import (
        resize_image_array,
    )

    a = np.arange(16, dtype=np.uint8).reshape(4, 4, 1)
    # nearest 4->2: pixel centers (0.5,1.5)*4/2 -> src rows/cols 1,3
    near = resize_image_array(a, 2, 2, method="nearest")
    assert near[:, :, 0].tolist() == [[5, 7], [13, 15]]
    # area 4->2: exact box means with integer floor
    area = resize_image_array(a, 2, 2, method="area")
    assert area[:, :, 0].tolist() == [[2, 4], [10, 12]]
    # upscale via nearest replicates
    up = resize_image_array(np.array([[[7]], [[9]]], dtype=np.uint8), 2, 4)
    assert up[:, :, 0].tolist() == [[7, 7], [7, 7], [9, 9], [9, 9]]
    import pytest as _pt
    with _pt.raises(ValueError, match="integer factors"):
        resize_image_array(a, 3, 3, method="area")
    with _pt.raises(ValueError, match="nearest | area"):
        resize_image_array(a, 2, 2, method="bilinear")


def test_resize_images_spark(spark):
    """End-to-end: PNG and JPEG payloads resize through mapInPandas,
    re-decode to the exact resized pixels; dirty payloads classify
    into err instead of killing the job."""
    from nlu_data_warehouse_project_spark.operators.jpeg import encode_jpeg
    from nlu_data_warehouse_project_spark.operators.multimodal import (
        MEDIA_SCHEMA, decode_png, encode_png, resize_image_array, resize_images,
    )

    grad = np.fromfunction(
        lambda y, x, c: (x * 11 + y * 7 + c * 3) % 256, (8, 12, 3)
    ).astype(np.uint8)
    png = encode_png(12, 8, 3, grad.tobytes())
    jpg = encode_jpeg(12, 8, 3, grad.tobytes())
    rows = [(1, png, None), (2, jpg, None), (3, b"not an image", None)]
    df = spark.createDataFrame(rows, MEDIA_SCHEMA)
    got = {r["media_id"]: r for r in resize_images(df, 6, 4).collect()}
    assert (got[1]["width"], got[1]["height"], got[1]["channels"]) == (6, 4, 3)
    want = resize_image_array(grad, 6, 4)
    out = decode_png(bytes(got[1]["payload"]))
    assert out["pixels"] == want.tobytes()  # PNG path: bit-exact
    assert got[2]["err"] is None and got[2]["width"] == 6  # JPEG decodes too
    assert got[3]["payload"] is None and "NotImplementedError" in got[3]["err"]
