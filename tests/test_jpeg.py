"""Baseline JPEG codec (VERDICT r12 #6): encode_jpeg fixtures round-
trip through decode_jpeg with bounded DCT error, the header parser
agrees with the decoder, subsampled/restart-interval streams decode,
and the unsupported variants keep their honest fail-fasts.

No image library exists in this container (that is WHY the codec is
hand-rolled), so the spec-compliance evidence is: (a) lossless
round-trip at flat quant=1 on sub-range gradients, (b) the marker
stream is parsed by `parse_image_header`, an independent older code
path, and (c) structural checks on the emitted segments."""

from __future__ import annotations

import os

import numpy as np
import pytest

from nlu_data_warehouse_project_spark.operators.jpeg import (
    _ZIGZAG, decode_jpeg, encode_jpeg,
)
from nlu_data_warehouse_project_spark.operators.multimodal import (
    decode_image, parse_image_header,
)


def _gray(w: int, h: int) -> bytes:
    return bytes(((x * 7 + y * 11) % 256) for y in range(h) for x in range(w))


def _rgb(w: int, h: int) -> bytes:
    return bytes(
        v for y in range(h) for x in range(w)
        for v in ((x * 3) % 256, (y * 5) % 256, ((x + y) * 2) % 256)
    )


def test_zigzag_is_the_spec_walk():
    # spot anchors of the canonical table + permutation property
    assert _ZIGZAG[:10] == [0, 1, 8, 16, 9, 2, 3, 10, 17, 24]
    assert _ZIGZAG[-4:] == [47, 55, 62, 63]
    assert sorted(_ZIGZAG) == list(range(64))


def test_gray_roundtrip_exact_at_flat_quant():
    """Gradient within one DCT block's dynamic range, quant=1: the
    only loss is FDCT/IDCT float rounding, which round() absorbs."""
    w, h = 16, 13  # non-multiple-of-8 exercises edge padding + crop
    px = _gray(w, h)
    img = decode_jpeg(encode_jpeg(w, h, 1, px))
    assert (img["width"], img["height"], img["channels"]) == (w, h, 1)
    assert img["format"] == "jpeg"
    assert max(abs(a - b) for a, b in zip(px, img["pixels"])) == 0


def test_rgb_roundtrip_within_color_rounding():
    w, h = 24, 17
    px = _rgb(w, h)
    img = decode_jpeg(encode_jpeg(w, h, 3, px))
    assert (img["width"], img["height"], img["channels"]) == (w, h, 3)
    # YCbCr forward+inverse rounding costs at most ~2 counts
    assert max(abs(a - b) for a, b in zip(px, img["pixels"])) <= 2


def test_420_subsampling_roundtrip_flat_chroma():
    """Gray-valued RGB has constant (128) chroma, so 2x2 box
    subsampling is lossless and the upsampling path is isolated."""
    w, h = 24, 17
    px = bytes(v for y in range(h) for x in range(w)
               for v in (((x * 9 + y * 4) % 256,) * 3))
    img = decode_jpeg(encode_jpeg(w, h, 3, px, subsample_420=True))
    assert max(abs(a - b) for a, b in zip(px, img["pixels"])) <= 2


def test_restart_intervals_reset_dc_predictors():
    w, h = 24, 17
    px = _rgb(w, h)
    payload = encode_jpeg(w, h, 3, px, restart_interval=2)
    assert b"\xff\xd0" in payload or b"\xff\xd1" in payload  # RSTn emitted
    img = decode_jpeg(payload)
    assert max(abs(a - b) for a, b in zip(px, img["pixels"])) <= 2


def test_coarse_quant_decodes_and_loses_bounded():
    w, h = 16, 16
    px = _gray(w, h)
    img = decode_jpeg(encode_jpeg(w, h, 1, px, quant=16))
    # quantizer step 16 bounds per-coefficient error by 8; the spatial
    # error stays well under the step on smooth content
    assert max(abs(a - b) for a, b in zip(px, img["pixels"])) <= 16


def test_header_parser_agrees_with_decoder():
    payload = encode_jpeg(40, 25, 3, _rgb(40, 25))
    assert parse_image_header(payload) == ("jpeg", 40, 25)
    assert decode_image(payload)["width"] == 40  # dispatch via signature


def test_arithmetic_and_malformed_fail_fast():
    payload = bytearray(encode_jpeg(16, 13, 1, _gray(16, 13)))
    sof = payload.index(b"\xff\xc0")
    payload[sof + 1] = 0xC9  # rewrite SOF0 -> SOF9 (arithmetic sequential)
    with pytest.raises(NotImplementedError, match="arithmetic|SOF9"):
        decode_jpeg(bytes(payload))
    with pytest.raises(ValueError):
        decode_jpeg(b"\xff\xd8\xff\xe0 jpeg-ish")
    with pytest.raises(ValueError):
        decode_jpeg(b"not a jpeg at all")
    # truncated scan: entropy data runs out mid-block
    good = encode_jpeg(16, 13, 1, _gray(16, 13))
    with pytest.raises(ValueError):
        decode_jpeg(good[: len(good) - (len(good) - good.index(b"\xff\xda")) // 2])


def _noisy_rgb(w, h, seed=3):
    """Gradient + noise: AC coefficients at many magnitudes, so the
    refinement scans actually carry new/history coefficients, ZRLs and
    EOB runs."""
    rng = np.random.default_rng(seed)
    y, x = np.mgrid[0:h, 0:w]
    base = np.stack([(x * 3 + y * 2) % 256, (x * 5) % 256, (y * 7) % 256], axis=2)
    return np.clip(base + rng.normal(0, 25, (h, w, 3)), 0, 255).astype(np.uint8).tobytes()


def test_progressive_decodes_pixel_identical_to_baseline():
    """The decisive cross-form check (r14): a progressive file and a
    baseline file of the same image carry the SAME quantized
    coefficients in different entropy layouts, so their decodes must
    be pixel-IDENTICAL — over color/gray, 4:2:0, MCU-unaligned sizes
    and coarser quantizers (EOB-run-heavy streams)."""
    from nlu_data_warehouse_project_spark.operators.jpeg import encode_jpeg_progressive

    for w, h, ch, sub, q in [
        (16, 8, 3, False, 1), (40, 25, 3, False, 2), (33, 17, 3, True, 1),
        (16, 13, 1, False, 1), (24, 24, 3, True, 4),
    ]:
        px = _noisy_rgb(w, h) if ch == 3 else _gray(w, h)
        base = decode_jpeg(encode_jpeg(w, h, ch, px, quant=q, subsample_420=sub))
        prog = decode_jpeg(
            encode_jpeg_progressive(w, h, ch, px, quant=q, subsample_420=sub)
        )
        assert prog["pixels"] == base["pixels"], (w, h, ch, sub, q)
        assert (prog["width"], prog["height"]) == (w, h)


def test_progressive_scan_script_variants():
    """Spectral-selection-only, DC-approximation-only and
    AC-approximation-only scripts all reconstruct the exact baseline
    pixels — each progressive decode path is pinned in isolation."""
    from nlu_data_warehouse_project_spark.operators.jpeg import encode_jpeg_progressive

    px = _noisy_rgb(24, 16, seed=7)
    want = decode_jpeg(encode_jpeg(24, 16, 3, px))["pixels"]
    scripts = {
        "spectral": [(None, 0, 0, 0, 0)] + [(ci, 1, 63, 0, 0) for ci in range(3)],
        "banded": [(None, 0, 0, 0, 0)]
        + [s for ci in range(3) for s in ((ci, 1, 5, 0, 0), (ci, 6, 63, 0, 0))],
        "dc_approx": [(None, 0, 0, 0, 1), (None, 0, 0, 1, 0)]
        + [(ci, 1, 63, 0, 0) for ci in range(3)],
        "ac_approx": [(None, 0, 0, 0, 0)]
        + [(ci, 1, 63, 0, 1) for ci in range(3)]
        + [(ci, 1, 63, 1, 0) for ci in range(3)],
    }
    for name, script in scripts.items():
        got = decode_jpeg(encode_jpeg_progressive(24, 16, 3, px, scans=script))
        assert got["pixels"] == want, name


def test_multiscan_baseline_decodes():
    """ADVICE r13 asked for a fail-fast on per-component baseline
    scans; round 14 upgraded it to a real decode: a spec-legal SOF0
    file with three separate full-band scans reconstructs the exact
    single-scan pixels (the multi-scan machinery handles baseline
    too)."""
    from nlu_data_warehouse_project_spark.operators.jpeg import encode_jpeg_progressive

    px = _noisy_rgb(16, 8, seed=11)
    want = decode_jpeg(encode_jpeg(16, 8, 3, px))["pixels"]
    ms = encode_jpeg_progressive(
        16, 8, 3, px, scans=[(ci, 0, 63, 0, 0) for ci in range(3)], sof_marker=0xC0
    )
    assert decode_jpeg(ms)["pixels"] == want


def test_feature_path_consumes_jpeg(spark):
    """extract_features(use_fake_extractor=False) — the Arrow-batched
    mapInPandas real-pixel path — now featurizes JPEG payloads."""
    from nlu_data_warehouse_project_spark.operators.multimodal import (
        MEDIA_SCHEMA, extract_features,
    )

    w, h = 16, 8
    solid = bytes([100, 150, 200] * (w * h))
    payload = encode_jpeg(w, h, 3, solid)
    df = spark.createDataFrame([(1, payload, None)], MEDIA_SCHEMA)
    feat = extract_features(df, use_fake_extractor=False).collect()[0]["feature"]
    assert feat[0] == float(w) and feat[1] == float(h) and feat[2] == 3.0
    # per-channel means within codec rounding of the solid color
    assert abs(feat[4] - 100.0) <= 2 and abs(feat[5] - 150.0) <= 2
    assert abs(feat[6] - 200.0) <= 2


def test_cmyk_roundtrip_raw_ycck_and_progressive():
    """Adobe 4-component JPEG (r14): raw CMYK (APP14 transform 0) and
    YCCK (transform 2) both round-trip to the original samples within
    the quantizer+transform rounding bound; progressive CMYK decodes
    pixel-identical to baseline CMYK (same coefficients)."""
    from nlu_data_warehouse_project_spark.operators.jpeg import encode_jpeg_progressive

    rng = np.random.default_rng(9)
    w, h = 24, 16
    cmyk = np.clip(
        np.mgrid[0:h, 0:w][0][:, :, None] * np.array([3, 5, 7, 11]) % 256
        + rng.normal(0, 20, (h, w, 4)),
        0, 255,
    ).astype(np.uint8)
    px = cmyk.tobytes()

    raw = decode_jpeg(encode_jpeg(w, h, 4, px))
    assert raw["channels"] == 4
    got = np.frombuffer(raw["pixels"], dtype=np.uint8).reshape(h, w, 4)
    assert np.abs(got.astype(int) - cmyk.astype(int)).max() <= 1  # DCT rounding

    ycck = decode_jpeg(encode_jpeg(w, h, 4, px, ycck=True))
    assert ycck["channels"] == 4
    got2 = np.frombuffer(ycck["pixels"], dtype=np.uint8).reshape(h, w, 4)
    assert np.abs(got2.astype(int) - cmyk.astype(int)).max() <= 2  # + color transform

    prog = decode_jpeg(encode_jpeg_progressive(w, h, 4, px))
    assert prog["pixels"] == raw["pixels"]

    # the real-pixel feature path consumes 4-channel output
    from nlu_data_warehouse_project_spark.operators.multimodal import _pixel_feature

    feats = _pixel_feature(encode_jpeg(w, h, 4, px))
    assert feats[:3] == [float(w), float(h), 4.0]


def test_12bit_grayscale_decodes_and_cross_form_matches():
    """r14: 12-bit precision (SOF P=12) decodes for both baseline and
    progressive forms — pixel-identical to each other (same
    coefficients), and within DCT rounding of the /16-scaled source
    (the pixels field stays uint8 row-major for every precision, by
    contract)."""
    from nlu_data_warehouse_project_spark.operators.jpeg import encode_jpeg_progressive

    rng = np.random.default_rng(4)
    w, h = 24, 16
    y, x = np.mgrid[0:h, 0:w]
    samp = np.clip(
        (x * 40 + y * 60) + rng.integers(0, 50, (h, w)), 0, 4095
    ).astype("<u2")
    px = samp.tobytes()
    prog = decode_jpeg(encode_jpeg_progressive(w, h, 1, px, precision=12))
    base = decode_jpeg(
        encode_jpeg_progressive(
            w, h, 1, px, precision=12, scans=[(0, 0, 63, 0, 0)], sof_marker=0xC0
        )
    )
    assert prog["pixels"] == base["pixels"]
    got = np.frombuffer(prog["pixels"], dtype=np.uint8).reshape(h, w)
    want = np.clip(np.round(samp.astype(float) / 16.0), 0, 255)
    assert np.abs(got - want).max() <= 1
    # 16-bit precision stays an honest fail-fast
    bad = bytearray(encode_jpeg_progressive(w, h, 1, px, precision=12))
    sof = bad.index(b"\xff\xc2")
    bad[sof + 4] = 16
    with pytest.raises(NotImplementedError, match="precision"):
        decode_jpeg(bytes(bad))


# ---------------------------------------------------------------------------
# round 15 (ADVICE r14): third-party fixtures, Adobe RGB, fill bytes
# ---------------------------------------------------------------------------

_FIXDIR = os.path.join(os.path.dirname(__file__), "fixtures", "jpeg")


def _sof_markers(payload: bytes) -> set:
    """Real SOF markers reached by walking segments (not a raw byte
    scan, which would hit thumbnails inside APP1)."""
    import struct as _struct

    out, pos = set(), 2
    while pos + 4 <= len(payload):
        if payload[pos] != 0xFF:
            break
        m = payload[pos + 1]
        if m == 0xD9 or m == 0xDA:
            break
        if m == 0xFF or m == 0x01 or 0xD0 <= m <= 0xD7:
            pos += 1 if m == 0xFF else 2
            continue
        if 0xC0 <= m <= 0xCF and m not in (0xC4, 0xC8, 0xCC):
            out.add(m)
        (seglen,) = _struct.unpack(">H", payload[pos + 2:pos + 4])
        pos += 2 + seglen
    return out


@pytest.mark.parametrize("name, progressive", [
    ("thin-white-stripe.jpg", True),    # nodejs docs, SOF2 progressive
    ("full-white-stripe.jpg", True),    # nodejs docs, SOF2 progressive
    ("54893.jpg", False),               # Spark mllib kitten, SOF0 baseline
    ("grayscale.jpg", True),            # Spark mllib, 1-ch SOF2 progressive
])
def test_third_party_fixture_matches_imageio(name, progressive):
    """ADVICE r14: progressive/real-photo decode validated against an
    INDEPENDENT codec chain at least once — these fixtures were
    produced by third-party encoders (nodejs docs images, Spark's
    mllib samples; none touched this repo's encoder), and the pinned
    reference grids are Java ImageIO's decode of the same bytes
    (captured via Spark's `image` source).  A shared misreading of
    SOF2 refinement semantics between the sibling in-repo
    encoder/decoder cannot pass this: the encoder is not in the loop.
    Tolerance ±2/sample: T.81 Annex A allows small IDCT variation
    between conforming decoders (measured max diff: 2)."""
    with open(os.path.join(_FIXDIR, name), "rb") as f:
        payload = f.read()
    sofs = _sof_markers(payload)
    assert (0xC2 in sofs) == progressive, f"{name}: SOFs {sofs}"
    img = decode_jpeg(payload)
    got = np.frombuffer(img["pixels"], np.uint8).reshape(
        img["height"], img["width"], img["channels"]
    )[::8, ::8, :]
    ref = np.load(os.path.join(_FIXDIR, name.replace(".jpg", ".imageio_grid.npy")))
    assert got.shape == ref.shape
    diff = np.abs(got.astype(int) - ref.astype(int))
    assert diff.max() <= 2, f"{name}: max diff {diff.max()} vs ImageIO"


def test_adobe_rgb_transform0_roundtrip():
    """ADVICE r14: a 3-component Adobe JPEG with transform=0 stores
    RGB planes raw — the decoder must NOT apply the JFIF YCbCr
    transform.  Exact round-trip at flat quant on the 8x8 grid (the
    gray-exactness argument, per plane)."""
    w, h = 16, 8
    px = _rgb(w, h)
    img = decode_jpeg(encode_jpeg(w, h, 3, px, adobe_rgb=True))
    assert (img["width"], img["height"], img["channels"]) == (w, h, 3)
    assert img["pixels"] == px
    # and the same pixels WITHOUT the marker decode through YCbCr —
    # i.e. the transform-0 path is genuinely different stored bytes,
    # not a decode no-op
    via_ycbcr = decode_jpeg(encode_jpeg(w, h, 3, px))
    got = np.frombuffer(via_ycbcr["pixels"], np.uint8).astype(int)
    assert np.abs(got - np.frombuffer(px, np.uint8).astype(int)).max() <= 2
    with pytest.raises(ValueError):
        encode_jpeg(w, h, 1, _gray(w, h), adobe_rgb=True)
    with pytest.raises(ValueError):
        encode_jpeg(w, h, 3, px, adobe_rgb=True, subsample_420=True)


def test_ff_fill_bytes_between_segments_decode():
    """ADVICE r14: T.81 B.1.1.2 allows runs of 0xFF fill bytes before
    any marker; the scan-end search and the segment walker must skip
    them instead of parsing padding as a segment header."""
    from nlu_data_warehouse_project_spark.operators.jpeg import (
        encode_jpeg_progressive,
    )

    w, h = 24, 16
    px = _noisy_rgb(w, h)
    clean = encode_jpeg_progressive(w, h, 3, px)
    want = decode_jpeg(clean)["pixels"]

    # fill run before EOI (ends the last scan's entropy data)
    padded = clean[:-2] + b"\xff\xff\xff" + clean[-2:]
    assert decode_jpeg(padded)["pixels"] == want

    # fill run before a mid-file marker: the DHT that follows the
    # first scan (0xFF 0xC4 cannot occur inside entropy data, where
    # 0xFF is always stuffed with 0x00 or an RST)
    first_sos = clean.index(b"\xff\xda")
    mid_dht = clean.index(b"\xff\xc4", first_sos)
    padded2 = clean[:mid_dht] + b"\xff\xff" + clean[mid_dht:]
    assert decode_jpeg(padded2)["pixels"] == want

    # and fill bytes between HEADER segments (before the first SOS)
    first_dqt = clean.index(b"\xff\xdb")
    padded3 = clean[:first_dqt] + b"\xff" + clean[first_dqt:]
    assert decode_jpeg(padded3)["pixels"] == want


def test_truncation_fuzz_fails_fast_never_hangs():
    """Crawl payloads arrive truncated mid-anything; the decoder must
    raise (ValueError / NotImplementedError) or return a partial-but-
    well-formed result — never hang, loop, or throw a non-ValueError
    internal error.  Deterministic fuzz: a third-party progressive
    fixture truncated at every marker boundary and at fixed strides
    inside entropy data, plus single-byte corruptions at every marker
    id byte."""
    with open(os.path.join(_FIXDIR, "thin-white-stripe.jpg"), "rb") as f:
        payload = f.read()

    # truncation at every 0xFF position (marker boundaries + stuffed
    # data bytes) and at a fixed stride elsewhere
    cuts = [i for i in range(2, len(payload)) if payload[i] == 0xFF]
    cuts += list(range(2, len(payload), 997))
    for cut in cuts:
        try:
            img = decode_jpeg(payload[:cut])
            # a successful partial decode must still honor the contract
            assert len(img["pixels"]) == img["width"] * img["height"] * img["channels"]
        except (ValueError, NotImplementedError):
            pass  # fail-fast is the expected outcome

    # flip every marker id byte to a reserved/garbage value
    for i in range(2, min(len(payload) - 1, 4000)):
        if payload[i] == 0xFF and payload[i + 1] not in (0x00,):
            mutated = bytearray(payload)
            mutated[i + 1] = 0x13  # not a marker id
            try:
                decode_jpeg(bytes(mutated))
            except (ValueError, NotImplementedError):
                pass


# ---------------------------------------------------------------------------
# round 15b: lossless JPEG (SOF3, Annex H)
# ---------------------------------------------------------------------------

def test_lossless_roundtrip_exact_all_predictors():
    """SOF3 is LOSSLESS: encode->decode must reproduce every byte for
    every predictor (1-7), gray and 3-channel, on worst-case random
    data (no spatial correlation — exercises wide categories and the
    mod-2^16 wrap)."""
    from nlu_data_warehouse_project_spark.operators.jpeg import (
        encode_jpeg_lossless,
    )

    rng = np.random.RandomState(7)
    for pred in range(1, 8):
        px = rng.randint(0, 256, size=(13, 17, 3), dtype=np.uint8).tobytes()
        img = decode_jpeg(encode_jpeg_lossless(17, 13, 3, px, predictor=pred))
        assert (img["width"], img["height"], img["channels"]) == (17, 13, 3)
        assert img["pixels"] == px
    g = rng.randint(0, 256, size=(8, 8), dtype=np.uint8).tobytes()
    assert decode_jpeg(encode_jpeg_lossless(8, 8, 1, g))["pixels"] == g


def test_lossless_16bit_and_narrow_precision():
    """Full 16-bit samples round-trip exactly through ``raw_planes``
    (the uint8 ``pixels`` view scales >>8 per the 12-bit convention);
    precision 4 also decodes (2-16 allowed for SOF3)."""
    from nlu_data_warehouse_project_spark.operators.jpeg import (
        encode_jpeg_lossless,
    )

    rng = np.random.RandomState(11)
    a = rng.randint(0, 65536, size=(9, 11), dtype=np.uint16)
    img = decode_jpeg(
        encode_jpeg_lossless(11, 9, 1, a.astype("<u2").tobytes(),
                             predictor=4, precision=16)
    )
    assert img["bits"] == 16
    assert np.array_equal(img["raw_planes"][:, :, 0], a)
    assert img["pixels"] == (a >> 8).astype(np.uint8).tobytes()

    b = rng.randint(0, 16, size=(5, 7), dtype=np.uint8)
    img4 = decode_jpeg(
        encode_jpeg_lossless(7, 5, 1, b.tobytes(), precision=4)
    )
    assert np.array_equal(img4["raw_planes"][:, :, 0], b)


def test_lossless_validation_and_fail_fasts():
    from nlu_data_warehouse_project_spark.operators.jpeg import (
        encode_jpeg_lossless,
    )

    with pytest.raises(ValueError):
        encode_jpeg_lossless(4, 4, 1, bytes(16), predictor=0)
    with pytest.raises(ValueError):
        encode_jpeg_lossless(4, 4, 1, bytes(15))  # short buffer
    with pytest.raises(ValueError):
        encode_jpeg_lossless(4, 4, 1, bytes([64] * 32), precision=5)  # 64 >= 2^5
    with pytest.raises(ValueError, match="point transform"):
        encode_jpeg_lossless(4, 4, 1, bytes(16), pt=8)  # pt must be < P
    # an RST marker in the scan without a DRI segment is corruption
    from nlu_data_warehouse_project_spark.operators.jpeg import (
        encode_jpeg_lossless as _enc,
    )
    clean = _enc(6, 6, 1, bytes(range(36)))
    sos_at = clean.index(b"\xff\xda")
    spliced = clean[:sos_at + 12] + b"\xff\xd0" + clean[sos_at + 12:]
    with pytest.raises(ValueError, match="without DRI"):
        decode_jpeg(spliced)


# ---------------------------------------------------------------------------
# round 16: lossless point transform, restart intervals, subsampling
# (the last three SOF3 corner-case fail-fasts made real)
# ---------------------------------------------------------------------------

def test_lossless_point_transform_roundtrip():
    """With Pt, coding runs on samples >> Pt and the decoder output is
    (sample >> Pt) << Pt (T.81 H.1.2.1 / H.2.2) — exact in the shifted
    domain, for 8- and 16-bit, every predictor class."""
    from nlu_data_warehouse_project_spark.operators.jpeg import (
        encode_jpeg_lossless,
    )

    rng = np.random.RandomState(16)
    a8 = rng.randint(0, 256, size=(9, 14, 3), dtype=np.uint8)
    for pt in (1, 3):
        img = decode_jpeg(
            encode_jpeg_lossless(14, 9, 3, a8.tobytes(), predictor=4, pt=pt)
        )
        want = (a8.astype(np.int64) >> pt) << pt
        assert np.array_equal(img["raw_planes"], want)
    a16 = rng.randint(0, 65536, size=(7, 5), dtype=np.uint16)
    img = decode_jpeg(
        encode_jpeg_lossless(5, 7, 1, a16.astype("<u2").tobytes(),
                             predictor=7, precision=16, pt=5)
    )
    assert np.array_equal(img["raw_planes"][:, :, 0],
                          (a16.astype(np.int64) >> 5) << 5)


def test_lossless_restart_intervals_roundtrip_and_semantics():
    """DRI + cyclic RSTn in a lossless scan: exact round-trip, marker
    presence pinned, and the predictor RESET at each restart verified
    by hand — sample 2 (first after RST0 at Ri=2) codes against the
    DEFAULT prediction 128, not its left neighbor."""
    from nlu_data_warehouse_project_spark.operators.jpeg import (
        encode_jpeg_lossless,
    )

    rng = np.random.RandomState(23)
    px = rng.randint(0, 256, size=(11, 13, 3), dtype=np.uint8).tobytes()
    payload = encode_jpeg_lossless(13, 11, 3, px, predictor=5,
                                   restart_interval=7)
    assert b"\xff\xdd" in payload          # DRI segment
    assert b"\xff\xd0" in payload          # first restart marker
    img = decode_jpeg(payload)
    assert img["pixels"] == px

    # hand-walk: 4x1 gray, Ri=2 -> diffs -118, +2 | RST0 | -121, 0
    tiny = encode_jpeg_lossless(4, 1, 1, bytes([10, 12, 7, 7]),
                                restart_interval=2)
    assert b"\xff\xd0" in tiny
    got = decode_jpeg(tiny)
    assert list(got["raw_planes"][0, :, 0]) == [10, 12, 7, 7]

    # out-of-order restart marker is a loud error, not a skew
    bad = bytearray(tiny)
    bad[bad.index(b"\xff\xd0") + 1] = 0xD3
    with pytest.raises(ValueError, match="out of order"):
        decode_jpeg(bytes(bad))

    # 16-bit + pt + restarts together
    a16 = rng.randint(0, 65536, size=(6, 9), dtype=np.uint16)
    img = decode_jpeg(
        encode_jpeg_lossless(9, 6, 1, a16.astype("<u2").tobytes(),
                             predictor=2, precision=16, pt=2,
                             restart_interval=3)
    )
    assert np.array_equal(img["raw_planes"][:, :, 0],
                          (a16.astype(np.int64) >> 2) << 2)


def test_lossless_subsampled_components():
    """Interleaved SOF3 with 2x2-subsampled chroma (the 4:2:0 shape):
    per-component planes round-trip exactly (decoder output replicates
    to full res with the DCT path's nearest-neighbor rule); odd frame
    dims exercise the MCU edge padding + crop."""
    from nlu_data_warehouse_project_spark.operators.jpeg import (
        encode_jpeg_lossless_planes,
    )

    rng = np.random.RandomState(31)
    w, h = 13, 9  # odd: MCU grid 7x5, luma padded to 14x10
    luma = rng.randint(0, 256, size=(h, w), dtype=np.uint8)
    cw, ch = -(-w // 2), -(-h // 2)
    cb = rng.randint(0, 256, size=(ch, cw), dtype=np.uint8)
    cr = rng.randint(0, 256, size=(ch, cw), dtype=np.uint8)
    payload = encode_jpeg_lossless_planes(
        [luma, cb, cr], [(2, 2), (1, 1), (1, 1)], w, h, predictor=6,
    )
    img = decode_jpeg(payload)
    assert (img["width"], img["height"], img["channels"]) == (w, h, 3)
    assert np.array_equal(img["raw_planes"][:, :, 0], luma)
    up = lambda p: np.repeat(np.repeat(p, 2, axis=0), 2, axis=1)[:h, :w]  # noqa: E731
    assert np.array_equal(img["raw_planes"][:, :, 1], up(cb))
    assert np.array_equal(img["raw_planes"][:, :, 2], up(cr))

    # subsampling + restarts + pt, all at once
    payload = encode_jpeg_lossless_planes(
        [luma, cb, cr], [(2, 2), (1, 1), (1, 1)], w, h, predictor=3,
        pt=1, restart_interval=4,
    )
    img = decode_jpeg(payload)
    assert np.array_equal(img["raw_planes"][:, :, 0],
                          (luma.astype(np.int64) >> 1) << 1)
    assert np.array_equal(img["raw_planes"][:, :, 1],
                          (up(cb).astype(np.int64) >> 1) << 1)

    # plane shape validation
    with pytest.raises(ValueError, match="shape"):
        encode_jpeg_lossless_planes([luma, cb, cr[:-1]],
                                    [(2, 2), (1, 1), (1, 1)], w, h)


# ---------------------------------------------------------------------------
# round 16b: hierarchical lossless pyramid (DHP + SOF3/SOF7, Annex J)
# ---------------------------------------------------------------------------

def test_hierarchical_lossless_roundtrip():
    """The pyramid is LOSSLESS end to end: decimate -> EXP-upsample ->
    mod-2^16 corrections must reproduce every byte at 1/2/3 levels,
    odd dims, all predictor classes for the base frame, 8- and 16-bit."""
    from nlu_data_warehouse_project_spark.operators.jpeg import (
        encode_jpeg_hierarchical,
    )

    rng = np.random.RandomState(41)
    a = rng.randint(0, 256, size=(13, 17), dtype=np.uint8)
    for levels in (1, 2, 3):
        payload = encode_jpeg_hierarchical(17, 13, a.tobytes(), levels=levels)
        if levels > 1:
            assert b"\xff\xde" in payload and b"\xff\xdf" in payload
        img = decode_jpeg(payload)
        assert img.get("hierarchical") is True
        assert (img["width"], img["height"], img["channels"]) == (17, 13, 1)
        assert np.array_equal(img["raw_planes"][:, :, 0], a)
        assert img["pixels"] == a.tobytes()
    b16 = rng.randint(0, 65536, size=(9, 8), dtype=np.uint16)
    for pred in (2, 4, 7):
        img = decode_jpeg(encode_jpeg_hierarchical(
            8, 9, b16.astype("<u2").tobytes(), levels=3, precision=16,
            predictor=pred))
        assert np.array_equal(img["raw_planes"][:, :, 0], b16)


def test_exp_upsample_filter_pinned():
    """J.1.1.2 by hand: even outputs copy, odd outputs are
    (a + b + 1) >> 1, the edge interpolates against itself."""
    from nlu_data_warehouse_project_spark.operators.jpeg import _exp_upsample

    row = np.array([[10, 20, 31]], dtype=np.int64)
    assert _exp_upsample(row, 1, 0).tolist() == [[10, 15, 20, 26, 31, 31]]
    col = np.array([[10], [20]], dtype=np.int64)
    assert _exp_upsample(col, 0, 1).tolist() == [[10], [15], [20], [20]]
    both = _exp_upsample(np.array([[4]], dtype=np.int64), 1, 1)
    assert both.tolist() == [[4, 4], [4, 4]]


def test_hierarchical_fail_fasts():
    from nlu_data_warehouse_project_spark.operators.jpeg import (
        encode_jpeg_hierarchical,
    )

    rng = np.random.RandomState(43)
    a = rng.randint(0, 256, size=(8, 8), dtype=np.uint8)
    payload = bytearray(encode_jpeg_hierarchical(8, 8, a.tobytes(), levels=2))

    # DCT-differential (SOF5) inside a hierarchical image: honest fail
    sof7_at = payload.index(b"\xff\xc7")
    dct = bytearray(payload)
    dct[sof7_at + 1] = 0xC5
    with pytest.raises(NotImplementedError, match="LOSSLESS pyramid"):
        decode_jpeg(bytes(dct))

    # a differential frame without DHP is malformed (main-loop path)
    from nlu_data_warehouse_project_spark.operators.jpeg import (
        encode_jpeg_lossless,
    )
    plain = bytearray(encode_jpeg_lossless(8, 8, 1, a.tobytes()))
    sof3_at = plain.index(b"\xff\xc3")
    plain[sof3_at + 1] = 0xC7
    with pytest.raises(NotImplementedError, match="without DHP"):
        decode_jpeg(bytes(plain))

    # differential scan must carry Ss=0
    bad = bytearray(payload)
    sos2_at = bad.index(b"\xff\xda", bad.index(b"\xff\xc7"))
    assert bad[sos2_at + 7] == 0  # Ss of the differential scan
    bad[sos2_at + 7] = 1
    with pytest.raises(ValueError, match="requires Ss=0"):
        decode_jpeg(bytes(bad))

    # EXP before any frame establishes a reference
    exp_first = (payload[:2]
                 + payload[payload.index(b"\xff\xde"):payload.index(b"\xff\xc4")]
                 + b"\xff\xdf\x00\x03\x11" + b"\xff\xd9")
    with pytest.raises(ValueError, match="EXP before any reference"):
        decode_jpeg(bytes(exp_first))


def test_hierarchical_multicomponent_roundtrip():
    """Round 16b: interleaved COLOR pyramids (any 1-4 components at
    full per-frame resolution) — exact at every level count, 8- and
    16-bit; a frame referencing a component not declared in DHP is a
    loud error."""
    from nlu_data_warehouse_project_spark.operators.jpeg import (
        encode_jpeg_hierarchical,
    )

    rng = np.random.RandomState(47)
    c = rng.randint(0, 256, size=(11, 9, 3), dtype=np.uint8)
    for levels in (1, 2, 3):
        img = decode_jpeg(encode_jpeg_hierarchical(
            9, 11, c.tobytes(), levels=levels, channels=3, predictor=6))
        assert img["channels"] == 3 and img.get("hierarchical") is True
        assert np.array_equal(img["raw_planes"], c)
        assert img["pixels"] == c.tobytes()
    d = rng.randint(0, 65536, size=(7, 6, 2), dtype=np.uint16)
    img = decode_jpeg(encode_jpeg_hierarchical(
        6, 7, d.astype("<u2").tobytes(), levels=2, channels=2, precision=16))
    assert np.array_equal(img["raw_planes"], d)

    # undeclared component id: corruption, not a guess
    payload = bytearray(encode_jpeg_hierarchical(
        9, 11, c.tobytes(), levels=2, channels=3))
    sof3_at = payload.index(b"\xff\xc3")
    # first frame component id byte (SOF: len2 P h2 w2 Nf [id hv tq]*)
    payload[sof3_at + 10] = 9
    with pytest.raises(ValueError, match="not declared in DHP"):
        decode_jpeg(bytes(payload))
