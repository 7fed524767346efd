"""Round 17: WebP-lossless (VP8L) decode + fixture encoder twin
(VERDICT r16 #4).  The encoder deliberately exercises every decoder
branch: all 14 predictor modes (including the last-column top-right
aliasing and the forced edge rules), color transforms with negative
int8 multipliers, subtract-green, palette bundling at all three
sub-8 depths, color cache, LZ77 through both the 2D distance map and
plain distances, meta-Huffman entropy images, and both Huffman
storages (simple and code-length-coded)."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from nlu_data_warehouse_project_spark.operators.multimodal import (
    decode_image, parse_image_header,
)
from nlu_data_warehouse_project_spark.operators.webp import (
    _DIST_MAP, decode_webp, encode_webp_lossless,
)


def _roundtrip(w, h, ch, px, **kw):
    payload = encode_webp_lossless(w, h, ch, px, **kw)
    assert parse_image_header(payload) == ("webp", w, h)
    img = decode_webp(payload)
    assert (img["width"], img["height"]) == (w, h), kw
    if ch == 4 and all(px[i] == 255 for i in range(3, len(px), 4)):
        exp, ch_exp = bytes(b for i, b in enumerate(px) if i % 4 != 3), 3
    else:
        exp, ch_exp = bytes(px), ch
    assert img["channels"] == ch_exp, kw
    assert img["pixels"] == exp, kw
    return payload


def test_distance_map_definition():
    """The 120-entry near-distance map is generated from its
    definition: {(x, 0): 1<=x<=8} ∪ {(x, y): -7<=x<=8, 1<=y<=7}
    ordered by (x²+y², -y, -x) — pinned here so a regression in the
    generator is loud, with spot values matching the libwebp table's
    nibble-packing semantics (y = high nibble 0..7, x = 8 - low
    nibble in -7..8)."""
    assert len(_DIST_MAP) == len(set(_DIST_MAP)) == 120
    assert all(1 <= x <= 8 for x, y in _DIST_MAP if y == 0)
    assert all(-7 <= x <= 8 and 1 <= y <= 7 for x, y in _DIST_MAP if y != 0)
    assert _DIST_MAP[:10] == [
        (0, 1), (1, 0), (1, 1), (-1, 1), (0, 2),
        (2, 0), (1, 2), (-1, 2), (2, 1), (-2, 1),
    ]
    assert _DIST_MAP[22] == (0, 4)
    assert _DIST_MAP[34:40] == [(0, 5), (3, 4), (-3, 4), (4, 3), (-4, 3), (5, 0)]
    d2 = [x * x + y * y for x, y in _DIST_MAP]
    assert d2 == sorted(d2)


def test_vp8l_literals_cache_and_lz77():
    rng = np.random.RandomState(7)
    a = rng.randint(0, 256, 6 * 5 * 3).astype(np.uint8).tobytes()
    plain = _roundtrip(6, 5, 3, a, lz77=False)
    runs = (bytes([10, 20, 30]) * 40) + rng.randint(0, 256, 60).astype(np.uint8).tobytes()
    mapped = _roundtrip(6, 10, 3, runs, lz77=True, mapped_distances=True)
    _roundtrip(6, 10, 3, runs, lz77=True, mapped_distances=False)
    _roundtrip(6, 10, 3, runs, lz77=False, cache_bits=4)
    _roundtrip(6, 10, 3, runs, lz77=True, cache_bits=6)
    # LZ77 actually compresses the run-heavy image
    assert len(mapped) < len(encode_webp_lossless(6, 10, 3, runs, lz77=False))
    assert len(plain) > 0


def test_vp8l_alpha_channels():
    rng = np.random.RandomState(11)
    rgba = rng.randint(0, 256, 4 * 7 * 4).astype(np.uint8)
    rgba[3::4] = np.where(rgba[3::4] == 255, 254, rgba[3::4])
    _roundtrip(4, 7, 4, rgba.tobytes(), lz77=False)
    # fully-opaque RGBA decodes onto the 3-channel surface
    rgba[3::4] = 255
    _roundtrip(4, 7, 4, rgba.tobytes(), lz77=False)


def test_vp8l_all_predictor_modes():
    rng = np.random.RandomState(13)
    for mode in range(14):
        px = rng.randint(0, 256, 9 * 9 * 3).astype(np.uint8).tobytes()
        _roundtrip(9, 9, 3, px, predictor_mode=mode)
    # degenerate shapes hit the forced edge rules hardest
    _roundtrip(1, 6, 3, rng.randint(0, 256, 18).astype(np.uint8).tobytes(),
               predictor_mode=11)
    _roundtrip(6, 1, 3, rng.randint(0, 256, 18).astype(np.uint8).tobytes(),
               predictor_mode=12)
    _roundtrip(1, 1, 3, bytes([9, 8, 7]), predictor_mode=13)


def test_vp8l_color_transform_and_combinations():
    rng = np.random.RandomState(17)
    for ct in ((5, 3, 2), (0xF0, 0x85, 0x7F), (255, 128, 1)):
        _roundtrip(9, 6, 3, rng.randint(0, 256, 9 * 6 * 3).astype(np.uint8).tobytes(),
                   color_transform=ct)
    _roundtrip(6, 5, 3, rng.randint(0, 256, 90).astype(np.uint8).tobytes(),
               subtract_green=True)
    # the full stack: color + subtract-green + predictor + cache,
    # inverses applied in reverse bitstream order
    _roundtrip(10, 8, 3, rng.randint(0, 256, 240).astype(np.uint8).tobytes(),
               color_transform=(17, 200, 9), subtract_green=True,
               predictor_mode=11, cache_bits=3)


def test_vp8l_palette_all_bundle_depths():
    rng = np.random.RandomState(19)
    for ncol, w, h in ((2, 13, 4), (3, 9, 5), (4, 9, 5), (9, 11, 3),
                       (17, 10, 4), (200, 30, 10)):
        pal = np.unique(rng.randint(0, 256, (ncol * 2, 3)).astype(np.uint8), axis=0)[:ncol]
        idx = rng.randint(0, len(pal), w * h)
        _roundtrip(w, h, 3, pal[idx].tobytes(), palette=True, lz77=False)


def test_vp8l_meta_huffman_groups():
    rng = np.random.RandomState(23)
    px = rng.randint(0, 256, 16 * 16 * 3).astype(np.uint8).tobytes()
    _roundtrip(16, 16, 3, px, meta_bits=3, n_groups=3)
    _roundtrip(16, 16, 3, px, meta_bits=2, n_groups=5, cache_bits=4)


def test_webp_dispatch_failfasts_and_truncation():
    rng = np.random.RandomState(29)
    px = rng.randint(0, 256, 5 * 4 * 3).astype(np.uint8).tobytes()
    payload = encode_webp_lossless(5, 4, 3, px)
    assert decode_image(payload)["pixels"] == px  # decode_image dispatch
    # lossy VP8 names its remedy
    lossy = bytearray(payload)
    lossy[12:16] = b"VP8 "
    with pytest.raises(NotImplementedError, match="libwebp|ffmpeg"):
        decode_webp(bytes(lossy))
    with pytest.raises(ValueError):
        decode_webp(b"RIFF\x00\x00\x00\x00WAVE")
    # truncation anywhere in the entropy stream is loud, never garbage
    for cut in (13, 21, len(payload) // 2, len(payload) - 2):
        with pytest.raises((ValueError, NotImplementedError)):
            decode_webp(payload[:cut])
    # corrupted chunk size past the buffer
    short = bytearray(payload)
    (size,) = struct.unpack("<I", short[16:20])
    short[16:20] = struct.pack("<I", size + 64)
    with pytest.raises(ValueError):
        decode_webp(bytes(short))
