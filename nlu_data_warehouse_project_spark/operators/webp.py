"""WebP-lossless (VP8L) decode + fixture encoder twin (VERDICT r16
#4) — from the public "WebP Lossless Bitstream Specification" and the
libwebp reference semantics it normatively describes.  VP8L is a
self-contained format: LSB-first bitstream, canonical Huffman codes,
LZ77 backward references with a 2D near-distance map, an optional
color cache, and four invertible transforms (predictor, color,
subtract-green, color-indexing).  No DCT, no external codec — the
same pure-Python+struct/numpy-free job as the GIF/TIFF decoders.

Decoder scope: the FULL still-image VP8L feature set — all four
transforms (each at most once, inverses applied in reverse bitstream
order), pixel bundling for small palettes, color cache, LZ77 with
both mapped (2D) and plain distances, meta-Huffman groups via the
entropy image, and both Huffman code storages (simple 1/2-symbol and
code-length-coded with max_symbol).  Lossy VP8 chunks keep the
fail-fast (`decode_webp` names libwebp/ffmpeg as the remedy); the
dims probe in `multimodal.parse_image_header` covers them.

VALIDATION CAVEAT (the lossless-JPEG restart discipline): no
independent WebP codec exists in this environment, so conformance is
pinned by the fixture encoder twin (a deliberately separate writer
exercising every decoder path: all 14 predictor modes, color
transforms with negative int8 multipliers, palette bundling at all
three depths, cache, mapped + plain distances, meta groups) plus
spec-derived structural constants.  The 120-entry distance map is
GENERATED from its definition — the set {(x, 0): 1<=x<=8} ∪
{(x, y): -7<=x<=8, 1<=y<=7} ordered by (x²+y², -y, -x) — rather than
transcribed, and spot-matches the libwebp table's published
nibble-packing semantics.  Cross-validate one real cwebp payload
when a second codec becomes available before trusting foreign files
in anger.

Scale shape: decode is plain Python because it is already the Python
side of an Arrow-batched ``mapInPandas`` (images arrive one batch per
partition); the work is O(pixels) per payload.
"""

from __future__ import annotations

import struct

# ---------------------------------------------------------------------------
# distance map: generated from its definition (see module docstring)
# ---------------------------------------------------------------------------

def _gen_dist_map() -> list[tuple[int, int]]:
    cand = [(x, 0) for x in range(1, 9)] + [
        (x, y) for y in range(1, 8) for x in range(-7, 9)
    ]
    cand.sort(key=lambda p: (p[0] * p[0] + p[1] * p[1], -p[1], -p[0]))
    return cand


_DIST_MAP = _gen_dist_map()
assert len(_DIST_MAP) == 120

_CL_ORDER = [17, 18, 0, 1, 2, 3, 4, 5, 16, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15]
_HASH_MUL = 0x1E35A7BD


def _sub_size(size: int, bits: int) -> int:
    return (size + (1 << bits) - 1) >> bits


# ---------------------------------------------------------------------------
# LSB-first bit IO
# ---------------------------------------------------------------------------

class _BitReader:
    __slots__ = ("d", "pos")

    def __init__(self, data: bytes):
        self.d = data
        self.pos = 0

    def read(self, n: int) -> int:
        if n == 0:
            return 0
        end = self.pos + n
        b1 = (end + 7) >> 3
        if b1 > len(self.d):
            raise ValueError("VP8L bitstream truncated")
        chunk = int.from_bytes(self.d[self.pos >> 3:b1], "little")
        v = (chunk >> (self.pos & 7)) & ((1 << n) - 1)
        self.pos = end
        return v


class _BitWriter:
    __slots__ = ("out", "acc", "n")

    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, v: int, nbits: int) -> None:
        if v < 0 or (nbits < 64 and v >> nbits):
            raise ValueError(f"value {v} does not fit {nbits} bits")
        self.acc |= v << self.n
        self.n += nbits
        while self.n >= 8:
            self.out.append(self.acc & 0xFF)
            self.acc >>= 8
            self.n -= 8

    def done(self) -> bytes:
        if self.n:
            self.out.append(self.acc & 0xFF)
            self.acc = 0
            self.n = 0
        return bytes(self.out)


# ---------------------------------------------------------------------------
# canonical Huffman (DEFLATE-style assignment; first-read bit = code MSB)
# ---------------------------------------------------------------------------

class _Huff:
    __slots__ = ("map", "single", "maxlen")

    def __init__(self, lengths: list[int]):
        nz = sorted((l, s) for s, l in enumerate(lengths) if l > 0)
        if not nz:
            raise ValueError("VP8L Huffman code with no symbols")
        if len(nz) == 1:
            self.single = nz[0][1]
            self.map = None
            self.maxlen = 0
            return
        self.single = None
        code = 0
        prev_len = 0
        m: dict[tuple[int, int], int] = {}
        for l, s in nz:
            code <<= l - prev_len
            if code >= (1 << l):
                raise ValueError("VP8L Huffman code over-subscribed")
            m[(l, code)] = s
            code += 1
            prev_len = l
        if code != (1 << prev_len):
            raise ValueError("VP8L Huffman code incomplete")
        self.map = m
        self.maxlen = prev_len

    def read(self, br: _BitReader) -> int:
        if self.map is None:
            return self.single
        acc = 0
        l = 0
        while l < self.maxlen:
            acc = (acc << 1) | br.read(1)
            l += 1
            s = self.map.get((l, acc))
            if s is not None:
                return s
        raise ValueError("VP8L invalid Huffman code word")


def _read_huffman_code(br: _BitReader, alphabet: int) -> _Huff:
    lengths = [0] * alphabet
    if br.read(1):  # simple code: 1 or 2 symbols
        n_sym = br.read(1) + 1
        s0 = br.read(8 if br.read(1) else 1)
        if s0 >= alphabet:
            raise ValueError(f"VP8L simple-code symbol {s0} >= alphabet {alphabet}")
        lengths[s0] = 1
        if n_sym == 2:
            s1 = br.read(8)
            if s1 >= alphabet or s1 == s0:
                raise ValueError("VP8L simple-code second symbol invalid")
            lengths[s1] = 1
        return _Huff(lengths)
    # normal: code-length code first
    n_cl = 4 + br.read(4)
    cl_lengths = [0] * 19
    for i in range(n_cl):
        cl_lengths[_CL_ORDER[i]] = br.read(3)
    cl = _Huff(cl_lengths)
    if br.read(1):  # explicit max symbol count
        nbits = 2 + 2 * br.read(3)
        max_symbol = 2 + br.read(nbits)
    else:
        max_symbol = alphabet
    prev = 8  # spec default when 16 repeats with no prior literal
    i = 0
    while i < alphabet:
        if max_symbol == 0:
            break
        max_symbol -= 1
        c = cl.read(br)
        if c < 16:
            lengths[i] = c
            i += 1
            if c:
                prev = c
        else:
            if c == 16:
                rep, fill = 3 + br.read(2), prev
            elif c == 17:
                rep, fill = 3 + br.read(3), 0
            else:
                rep, fill = 11 + br.read(7), 0
            if i + rep > alphabet:
                raise ValueError("VP8L code-length repeat overflows alphabet")
            if fill:
                for _ in range(rep):
                    lengths[i] = fill
                    i += 1
            else:
                i += rep
    return _Huff(lengths)


def _prefix_value(br: _BitReader, prefix: int) -> int:
    """LZ77 length/distance prefix decode (DEFLATE-shaped, 1-based)."""
    if prefix < 4:
        return prefix + 1
    extra = (prefix - 2) >> 1
    offset = (2 + (prefix & 1)) << extra
    return offset + br.read(extra) + 1


def _prefix_of(value: int) -> tuple[int, int, int]:
    """(prefix_code, extra_value, extra_bits) for a 1-based value —
    the encoder inverse of ``_prefix_value``."""
    u = value - 1
    if u < 4:
        return u, 0, 0
    extra = u.bit_length() - 2
    hi = (u >> extra) & 1
    return 2 * extra + 2 + hi, u - ((2 + hi) << extra), extra


# ---------------------------------------------------------------------------
# entropy-coded image
# ---------------------------------------------------------------------------

def _read_image(br: _BitReader, w: int, h: int, level0: bool) -> list[int]:
    """Decode one entropy-coded ARGB image (the spec's shared machinery
    for the main image AND the transform/entropy/palette sub-images:
    sub-images read the color-cache bit too, but never meta-Huffman)."""
    cache_bits = 0
    if br.read(1):
        cache_bits = br.read(4)
        if not 1 <= cache_bits <= 11:
            raise ValueError(f"VP8L color-cache bits {cache_bits} (1..11)")
    meta = None
    meta_bits = 0
    meta_w = 0
    n_groups = 1
    if level0 and br.read(1):
        meta_bits = br.read(3) + 2
        meta_w = _sub_size(w, meta_bits)
        meta_img = _read_image(br, meta_w, _sub_size(h, meta_bits), False)
        meta = [(p >> 8) & 0xFFFF for p in meta_img]  # (red << 8) | green
        n_groups = max(meta) + 1
    cache_size = (1 << cache_bits) if cache_bits else 0
    sizes = [256 + 24 + cache_size, 256, 256, 256, 40]
    groups = [[_read_huffman_code(br, s) for s in sizes] for _ in range(n_groups)]
    cache = [0] * cache_size
    total = w * h
    out = [0] * total
    pos = 0
    shift = 32 - cache_bits if cache_bits else 0
    while pos < total:
        if meta is not None:
            x, y = pos % w, pos // w
            g = groups[meta[(y >> meta_bits) * meta_w + (x >> meta_bits)]]
        else:
            g = groups[0]
        s = g[0].read(br)
        if s < 256:  # literal: green, then red, blue, alpha
            red = g[1].read(br)
            blue = g[2].read(br)
            alpha = g[3].read(br)
            px = (alpha << 24) | (red << 16) | (s << 8) | blue
            out[pos] = px
            pos += 1
            if cache_bits:
                cache[((_HASH_MUL * px) & 0xFFFFFFFF) >> shift] = px
        elif s < 280:  # LZ77 backward reference
            length = _prefix_value(br, s - 256)
            plain = _prefix_value(br, g[4].read(br))
            if plain > 120:
                dist = plain - 120
            else:
                dx, dy = _DIST_MAP[plain - 1]
                dist = dx + dy * w
                if dist < 1:
                    dist = 1
            if dist > pos:
                raise ValueError("VP8L backward reference before image start")
            if pos + length > total:
                raise ValueError("VP8L backward reference past image end")
            for _ in range(length):
                px = out[pos - dist]
                out[pos] = px
                pos += 1
                if cache_bits:
                    cache[((_HASH_MUL * px) & 0xFFFFFFFF) >> shift] = px
        else:  # color-cache reference
            idx = s - 280
            if idx >= cache_size:
                raise ValueError("VP8L cache index past cache size")
            out[pos] = cache[idx]
            pos += 1
    return out


# ---------------------------------------------------------------------------
# transform inverses
# ---------------------------------------------------------------------------

def _avg2(a: int, b: int) -> int:
    return ((((a ^ b) & 0xFEFEFEFE) >> 1) + (a & b)) & 0xFFFFFFFF


def _add_px(a: int, b: int) -> int:
    return (
        (((a & 0xFF00FF00) + (b & 0xFF00FF00)) & 0xFF00FF00)
        | (((a & 0x00FF00FF) + (b & 0x00FF00FF)) & 0x00FF00FF)
    )


def _sub_px(a: int, b: int) -> int:
    return (
        ((((a >> 24) & 0xFF) - ((b >> 24) & 0xFF)) & 0xFF) << 24
        | (((((a >> 16) & 0xFF) - ((b >> 16) & 0xFF)) & 0xFF) << 16)
        | (((((a >> 8) & 0xFF) - ((b >> 8) & 0xFF)) & 0xFF) << 8)
        | (((a & 0xFF) - (b & 0xFF)) & 0xFF)
    )


def _select(L: int, T: int, TL: int) -> int:
    d = 0
    for sh in (24, 16, 8, 0):
        lc, tc, tlc = (L >> sh) & 0xFF, (T >> sh) & 0xFF, (TL >> sh) & 0xFF
        d += abs(lc - tlc) - abs(tc - tlc)
    return T if d <= 0 else L


def _clamp_add_sub_full(L: int, T: int, TL: int) -> int:
    out = 0
    for sh in (24, 16, 8, 0):
        v = ((L >> sh) & 0xFF) + ((T >> sh) & 0xFF) - ((TL >> sh) & 0xFF)
        out |= (0 if v < 0 else 255 if v > 255 else v) << sh
    return out


def _clamp_add_sub_half(L: int, T: int, TL: int) -> int:
    ave = _avg2(L, T)
    out = 0
    for sh in (24, 16, 8, 0):
        a = (ave >> sh) & 0xFF
        delta = a - ((TL >> sh) & 0xFF)
        half = delta // 2 if delta >= 0 else -((-delta) // 2)  # C truncation
        v = a + half
        out |= (0 if v < 0 else 255 if v > 255 else v) << sh
    return out


def _predict(mode: int, L: int, T: int, TL: int, TR: int) -> int:
    if mode == 0:
        return 0xFF000000
    if mode == 1:
        return L
    if mode == 2:
        return T
    if mode == 3:
        return TR
    if mode == 4:
        return TL
    if mode == 5:
        return _avg2(_avg2(L, TR), T)
    if mode == 6:
        return _avg2(L, TL)
    if mode == 7:
        return _avg2(L, T)
    if mode == 8:
        return _avg2(TL, T)
    if mode == 9:
        return _avg2(T, TR)
    if mode == 10:
        return _avg2(_avg2(L, TL), _avg2(T, TR))
    if mode == 11:
        return _select(L, T, TL)
    if mode == 12:
        return _clamp_add_sub_full(L, T, TL)
    if mode == 13:
        return _clamp_add_sub_half(L, T, TL)
    raise ValueError(f"VP8L predictor mode {mode} (0-13)")


def _pred_at(out: list[int], pos: int, w: int, mode: int) -> int:
    """Prediction for pixel ``pos`` with the spec's forced edge rules;
    TR of the last column aliases the current row's first pixel (the
    contiguous-buffer rule)."""
    x, y = pos % w, pos // w
    if pos == 0:
        return 0xFF000000
    if y == 0:
        return out[pos - 1]
    if x == 0:
        return out[pos - w]
    return _predict(
        mode, out[pos - 1], out[pos - w], out[pos - w - 1], out[pos - w + 1]
    )


def _inv_predictor(px: list[int], w: int, h: int, bits: int, tiles: list[int]) -> list[int]:
    tiles_w = _sub_size(w, bits)
    for pos in range(w * h):
        x, y = pos % w, pos // w
        mode = (tiles[(y >> bits) * tiles_w + (x >> bits)] >> 8) & 0xFF
        px[pos] = _add_px(px[pos], _pred_at(px, pos, w, mode))
    return px


def _i8(v: int) -> int:
    return v - 256 if v >= 128 else v


def _ct_delta(t: int, c: int) -> int:
    return (_i8(t) * c) >> 5  # both int8; arithmetic shift


def _inv_color(px: list[int], w: int, h: int, bits: int, tiles: list[int]) -> list[int]:
    tiles_w = _sub_size(w, bits)
    for pos in range(w * h):
        x, y = pos % w, pos // w
        cte = tiles[(y >> bits) * tiles_w + (x >> bits)]
        g2r, g2b, r2b = cte & 0xFF, (cte >> 8) & 0xFF, (cte >> 16) & 0xFF
        p = px[pos]
        green = _i8((p >> 8) & 0xFF)
        red = (((p >> 16) & 0xFF) + _ct_delta(g2r, green)) & 0xFF
        blue = ((p & 0xFF) + _ct_delta(g2b, green) + _ct_delta(r2b, _i8(red))) & 0xFF
        px[pos] = (p & 0xFF00FF00) | (red << 16) | blue
    return px


def _inv_subtract_green(px: list[int]) -> list[int]:
    for i, p in enumerate(px):
        g = (p >> 8) & 0xFF
        red = (((p >> 16) & 0xFF) + g) & 0xFF
        blue = ((p & 0xFF) + g) & 0xFF
        px[i] = (p & 0xFF00FF00) | (red << 16) | blue
    return px


def _inv_palette(
    px: list[int], orig_w: int, h: int, bits: int, palette: list[int]
) -> list[int]:
    n = len(palette)
    out = [0] * (orig_w * h)
    if bits == 0:
        for i, p in enumerate(px):
            idx = (p >> 8) & 0xFF
            if idx >= n:
                raise ValueError(f"VP8L palette index {idx} >= size {n}")
            out[i] = palette[idx]
        return out
    packed_w = _sub_size(orig_w, bits)
    bpp = 8 >> bits
    mask = (1 << bpp) - 1
    for y in range(h):
        row = y * packed_w
        for x in range(orig_w):
            green = (px[row + (x >> bits)] >> 8) & 0xFF
            idx = (green >> ((x & ((1 << bits) - 1)) * bpp)) & mask
            if idx >= n:
                raise ValueError(f"VP8L palette index {idx} >= size {n}")
            out[y * orig_w + x] = palette[idx]
    return out


# ---------------------------------------------------------------------------
# top-level decode
# ---------------------------------------------------------------------------

def decode_vp8l(data: bytes) -> dict:
    """Decode a VP8L chunk payload (starting at the 0x2F signature)
    into the ``decode_png`` contract dict; channels is 4 when any
    decoded alpha differs from 255, else 3."""
    br = _BitReader(bytes(data))
    if br.read(8) != 0x2F:
        raise ValueError("VP8L signature byte missing")
    w = br.read(14) + 1
    h = br.read(14) + 1
    br.read(1)  # alpha-hint (advisory; channels decided from content)
    if br.read(3) != 0:
        raise ValueError("VP8L version must be 0")
    transforms: list[tuple[int, int, int, list[int] | None]] = []
    xsize = w
    seen: set[int] = set()
    while br.read(1):
        t = br.read(2)
        if t in seen:
            raise ValueError(f"VP8L transform {t} repeated")
        seen.add(t)
        if t in (0, 1):  # predictor / color: tile image
            bits = br.read(3) + 2
            timg = _read_image(br, _sub_size(xsize, bits), _sub_size(h, bits), False)
            transforms.append((t, bits, xsize, timg))
        elif t == 2:  # subtract green
            transforms.append((2, 0, xsize, None))
        else:  # color indexing
            n_colors = br.read(8) + 1
            pbits = 0 if n_colors > 16 else 1 if n_colors > 4 else 2 if n_colors > 2 else 3
            raw = _read_image(br, n_colors, 1, False)
            pal = []
            prev = 0
            for p in raw:  # palette entries delta-accumulate per byte
                cur = _add_px(p, prev)
                pal.append(cur)
                prev = cur
            transforms.append((3, pbits, xsize, pal))
            xsize = _sub_size(xsize, pbits)
    px = _read_image(br, xsize, h, True)
    for t, bits, oxsize, tdata in reversed(transforms):
        if t == 0:
            px = _inv_predictor(px, oxsize, h, bits, tdata)
        elif t == 1:
            px = _inv_color(px, oxsize, h, bits, tdata)
        elif t == 2:
            px = _inv_subtract_green(px)
        else:
            px = _inv_palette(px, oxsize, h, bits, tdata)
    has_alpha = any((p >> 24) != 0xFF for p in px)
    ch = 4 if has_alpha else 3
    out = bytearray(w * h * ch)
    i = 0
    for p in px:
        out[i] = (p >> 16) & 0xFF
        out[i + 1] = (p >> 8) & 0xFF
        out[i + 2] = p & 0xFF
        if has_alpha:
            out[i + 3] = (p >> 24) & 0xFF
        i += ch
    return {
        "format": "webp", "width": w, "height": h,
        "channels": ch, "pixels": bytes(out),
    }


def decode_webp(payload: bytes) -> dict:
    """RIFF walk: decode the VP8L chunk; VP8 (lossy) fails fast naming
    the remedy (its entropy-coded DCT needs libwebp/ffmpeg — the dims
    probe in parse_image_header covers classification)."""
    if (
        not isinstance(payload, (bytes, bytearray))
        or payload[:4] != b"RIFF"
        or payload[8:12] != b"WEBP"
    ):
        raise ValueError("not a WebP payload")
    pos = 12
    while pos + 4 <= len(payload):
        fourcc = payload[pos:pos + 4]
        if pos + 8 > len(payload):
            # chunk header truncated after the fourcc — still enough to
            # classify: a lossy chunk keeps the honest missing-codec
            # fail-fast, a lossless one is a malformed payload
            if fourcc == b"VP8 ":
                raise NotImplementedError(
                    "WebP lossy (VP8) decode needs libwebp or ffmpeg; "
                    "only VP8L (lossless) decodes here"
                )
            raise ValueError("WebP chunk header truncated")
        (size,) = struct.unpack("<I", payload[pos + 4:pos + 8])
        body = payload[pos + 8:pos + 8 + size]
        if fourcc == b"VP8L":
            if len(body) < size:
                raise ValueError("WebP VP8L chunk truncated")
            return decode_vp8l(body)
        if fourcc == b"VP8 ":
            raise NotImplementedError(
                "WebP lossy (VP8) decode needs libwebp or ffmpeg; only "
                "VP8L (lossless) decodes here"
            )
        pos += 8 + size + (size & 1)
    raise ValueError("WebP container has no VP8L chunk")


# ---------------------------------------------------------------------------
# fixture encoder twin
# ---------------------------------------------------------------------------

def _huffman_lengths(freqs: dict[int, int], limit: int) -> dict[int, int]:
    """Code lengths from frequencies via plain heap Huffman; if the
    depth exceeds ``limit``, flatten frequencies and retry (fixture
    inputs never get near the limit in practice)."""
    import heapq

    items = sorted(freqs.items())
    if not items:
        raise ValueError("empty histogram")
    if len(items) == 1:
        return {items[0][0]: 1}
    f = dict(items)
    while True:
        heap = [(fr, sym, None) for sym, fr in sorted(f.items())]
        heapq.heapify(heap)
        n = 0
        while len(heap) > 1:
            a = heapq.heappop(heap)
            b = heapq.heappop(heap)
            n += 1
            heapq.heappush(heap, (a[0] + b[0], 0x10000 + n, (a, b)))
        lengths: dict[int, int] = {}

        def walk(node, depth):
            if node[2] is None:
                lengths[node[1]] = max(depth, 1)
            else:
                walk(node[2][0], depth + 1)
                walk(node[2][1], depth + 1)

        walk(heap[0], 0)
        if max(lengths.values()) <= limit:
            return lengths
        f = {sym: (fr // 2) + 1 for sym, fr in f.items()}


def _canonical(lengths: dict[int, int]) -> dict[int, tuple[int, int]]:
    code = 0
    prev = 0
    out: dict[int, tuple[int, int]] = {}
    for l, s in sorted((l, s) for s, l in lengths.items()):
        code <<= l - prev
        out[s] = (code, l)
        code += 1
        prev = l
    return out


def _write_code(bw: _BitWriter, lengths: dict[int, int], alphabet: int) -> dict:
    """Write one Huffman code (simple when possible, else the
    code-length-coded normal form with no repeat codes) and return the
    symbol->(code, len) map for payload emission."""
    used = sorted(lengths)
    if len(used) <= 2 and all(s <= 255 for s in used):
        bw.write(1, 1)  # simple
        bw.write(len(used) - 1, 1)
        s0 = used[0]
        if s0 <= 1:
            bw.write(0, 1)
            bw.write(s0, 1)
        else:
            bw.write(1, 1)
            bw.write(s0, 8)
        if len(used) == 2:
            bw.write(used[1], 8)
            return {used[0]: (0, 1), used[1]: (1, 1)}
        return {used[0]: (0, 0)}
    if len(used) == 1:  # single symbol > 255: pad with a dummy 0
        lengths = {0: 1, used[0]: 1}
    bw.write(0, 1)  # normal
    full = [lengths.get(s, 0) for s in range(alphabet)]
    cl_freq: dict[int, int] = {}
    for l in full:
        cl_freq[l] = cl_freq.get(l, 0) + 1
    cl_lengths = _huffman_lengths(cl_freq, 7)
    n_cl = max(_CL_ORDER.index(s) for s in cl_lengths) + 1
    n_cl = max(n_cl, 4)
    bw.write(n_cl - 4, 4)
    for i in range(n_cl):
        bw.write(cl_lengths.get(_CL_ORDER[i], 0), 3)
    if len(cl_lengths) == 1:
        # single-symbol CL code: the decoder's 0-bit path fills the
        # whole alphabet without consuming bits — emit none
        (only,) = cl_lengths
        cl_codes = {only: (0, 0)}
    else:
        cl_codes = _canonical(cl_lengths)
    bw.write(0, 1)  # no explicit max_symbol
    for l in full:
        c, n = cl_codes[l]
        for b in range(n - 1, -1, -1):  # MSB first, matching the reader
            bw.write((c >> b) & 1, 1)
    return _canonical(lengths)


def _emit_symbol(bw: _BitWriter, codes: dict, s: int) -> None:
    c, n = codes[s]
    for b in range(n - 1, -1, -1):
        bw.write((c >> b) & 1, 1)


def _encode_core(
    bw: _BitWriter,
    px: list[int],
    w: int,
    h: int,
    cache_bits: int = 0,
    lz77: bool = False,
    mapped_distances: bool = True,
    meta_bits: int | None = None,
    n_groups: int = 1,
    level0: bool = False,
) -> None:
    """Entropy-code one ARGB image (the shared writer for the main
    image and all sub-images).  LZ77 here is deliberately simple —
    runs of the previous pixel (distance 1), emitted through the 2D
    map (plane code for (1, 0)) or as a plain 120+d code — enough to
    exercise every decoder branch."""
    total = w * h
    if meta_bits is not None:
        meta_w, meta_h = _sub_size(w, meta_bits), _sub_size(h, meta_bits)

        def group_of(pos: int) -> int:
            x, y = pos % w, pos // w
            return ((y >> meta_bits) * meta_w + (x >> meta_bits)) % n_groups
    else:
        n_groups = 1

        def group_of(pos: int) -> int:
            return 0

    # pass 1: event stream
    events: list[tuple] = []  # (group, kind, payload...)
    cache_size = (1 << cache_bits) if cache_bits else 0
    cache = [None] * cache_size
    shift = 32 - cache_bits if cache_bits else 0
    map_one = _DIST_MAP.index((1, 0)) + 1  # plane code for distance 1
    pos = 0
    while pos < total:
        g = group_of(pos)
        p = px[pos]
        if cache_bits:
            slot = ((_HASH_MUL * p) & 0xFFFFFFFF) >> shift
            if cache[slot] == p:
                events.append((g, "cache", slot))
                pos += 1
                continue
        if lz77 and pos > 0 and p == px[pos - 1]:
            run = 0
            while pos + run < total and px[pos + run] == px[pos + run - 1]:
                run += 1
                if run >= 4096:
                    break
            plain = map_one if mapped_distances else 121
            events.append((g, "copy", run, plain))
            if cache_bits:
                for k in range(run):
                    q = px[pos + k]
                    cache[((_HASH_MUL * q) & 0xFFFFFFFF) >> shift] = q
            pos += run
            continue
        events.append((g, "lit", p))
        if cache_bits:
            cache[((_HASH_MUL * p) & 0xFFFFFFFF) >> shift] = p
        pos += 1

    # pass 2: per-group histograms for the 5 codes
    sizes = [256 + 24 + cache_size, 256, 256, 256, 40]
    hists = [[{} for _ in range(5)] for _ in range(n_groups)]

    def bump(g, c, s):
        hists[g][c][s] = hists[g][c].get(s, 0) + 1

    for ev in events:
        g = ev[0]
        if ev[1] == "lit":
            p = ev[2]
            bump(g, 0, (p >> 8) & 0xFF)
            bump(g, 1, (p >> 16) & 0xFF)
            bump(g, 2, p & 0xFF)
            bump(g, 3, (p >> 24) & 0xFF)
        elif ev[1] == "copy":
            bump(g, 0, 256 + _prefix_of(ev[2])[0])
            bump(g, 4, _prefix_of(ev[3])[0])
        else:
            bump(g, 0, 280 + ev[2])
    for g in range(n_groups):  # every group needs all five codes
        for c in range(5):
            if not hists[g][c]:
                hists[g][c][0] = 1

    # header: cache bit, meta-huffman bit (+ entropy image), codes
    if cache_bits:
        bw.write(1, 1)
        bw.write(cache_bits, 4)
    else:
        bw.write(0, 1)
    if meta_bits is not None:
        if not level0:
            raise ValueError("meta-Huffman is a level-0 (main image) feature")
        bw.write(1, 1)
        bw.write(meta_bits - 2, 3)
        meta_px = [
            (0xFF << 24) | ((((t % n_groups) >> 8) & 0xFF) << 16)
            | (((t % n_groups) & 0xFF) << 8)
            for t in range(meta_w * meta_h)
        ]
        _encode_core(bw, meta_px, meta_w, meta_h)
    elif level0:
        # the meta-Huffman bit exists only on the main image; the
        # decoder never reads it for sub-images
        bw.write(0, 1)
    codes = []
    for g in range(n_groups):
        codes.append([
            _write_code(bw, _huffman_lengths(hists[g][c], 15), sizes[c])
            for c in range(5)
        ])

    # pass 3: payload
    for ev in events:
        g = ev[0]
        cg = codes[g]
        if ev[1] == "lit":
            p = ev[2]
            _emit_symbol(bw, cg[0], (p >> 8) & 0xFF)
            _emit_symbol(bw, cg[1], (p >> 16) & 0xFF)
            _emit_symbol(bw, cg[2], p & 0xFF)
            _emit_symbol(bw, cg[3], (p >> 24) & 0xFF)
        elif ev[1] == "copy":
            lp, le, lb = _prefix_of(ev[2])
            _emit_symbol(bw, cg[0], 256 + lp)
            bw.write(le, lb)
            dp, de, db = _prefix_of(ev[3])
            _emit_symbol(bw, cg[4], dp)
            bw.write(de, db)
        else:
            _emit_symbol(bw, cg[0], 280 + ev[2])


def encode_webp_lossless(
    width: int,
    height: int,
    channels: int,
    pixels: bytes,
    cache_bits: int = 0,
    lz77: bool = True,
    mapped_distances: bool = True,
    subtract_green: bool = False,
    palette: bool = False,
    predictor_mode: int | None = None,
    color_transform: tuple[int, int, int] | None = None,
    meta_bits: int | None = None,
    n_groups: int = 1,
) -> bytes:
    """VP8L fixture/export twin: RGB(A) samples -> a RIFF/WEBP/VP8L
    payload.  Options exist to exercise each decoder branch —
    ``predictor_mode`` applies the predictor transform with that mode
    in every tile (0-13), ``color_transform`` a constant
    (green_to_red, green_to_blue, red_to_blue) element, ``palette``
    the color-indexing transform (bundled when few colors),
    ``meta_bits``/``n_groups`` a real meta-Huffman entropy image.
    Round-trips exactly through ``decode_webp`` by construction."""
    if channels not in (3, 4):
        raise ValueError(f"channels={channels} (3/4)")
    if len(pixels) != width * height * channels:
        raise ValueError(f"need {width * height * channels} bytes")
    if palette and (subtract_green or predictor_mode is not None
                    or color_transform is not None):
        raise ValueError("fixture encoder: palette excludes other transforms")
    px = []
    for i in range(width * height):
        o = i * channels
        a = pixels[o + 3] if channels == 4 else 0xFF
        px.append((a << 24) | (pixels[o] << 16) | (pixels[o + 1] << 8) | pixels[o + 2])

    bw = _BitWriter()
    bw.write(0x2F, 8)
    bw.write(width - 1, 14)
    bw.write(height - 1, 14)
    bw.write(1 if channels == 4 else 0, 1)
    bw.write(0, 3)  # version
    xsize = width

    if color_transform is not None:
        g2r, g2b, r2b = color_transform
        bw.write(1, 1)
        bw.write(1, 2)  # color transform
        bits = 3
        tw, th = _sub_size(xsize, bits), _sub_size(height, bits)
        bw.write(bits - 2, 3)
        cte = ((r2b & 0xFF) << 16) | ((g2b & 0xFF) << 8) | (g2r & 0xFF) | (0xFF << 24)
        _encode_core(bw, [cte] * (tw * th), tw, th)
        for i, p in enumerate(px):  # forward: subtract the deltas
            green = _i8((p >> 8) & 0xFF)
            red0 = (p >> 16) & 0xFF
            red = (red0 - _ct_delta(g2r & 0xFF, green)) & 0xFF
            blue = ((p & 0xFF) - _ct_delta(g2b & 0xFF, green)
                    - _ct_delta(r2b & 0xFF, _i8(red0))) & 0xFF
            px[i] = (p & 0xFF00FF00) | (red << 16) | blue

    if subtract_green:
        bw.write(1, 1)
        bw.write(2, 2)
        for i, p in enumerate(px):
            g = (p >> 8) & 0xFF
            red = (((p >> 16) & 0xFF) - g) & 0xFF
            blue = ((p & 0xFF) - g) & 0xFF
            px[i] = (p & 0xFF00FF00) | (red << 16) | blue

    if predictor_mode is not None:
        if not 0 <= predictor_mode <= 13:
            raise ValueError("predictor_mode 0-13")
        bw.write(1, 1)
        bw.write(0, 2)  # predictor transform
        bits = 3
        tw, th = _sub_size(xsize, bits), _sub_size(height, bits)
        bw.write(bits - 2, 3)
        tile = (0xFF << 24) | (predictor_mode << 8)
        _encode_core(bw, [tile] * (tw * th), tw, th)
        recon = list(px)  # originals ARE the reconstructed values
        for pos in range(width * height):
            pred = _pred_at(recon, pos, width, predictor_mode)
            px[pos] = _sub_px(recon[pos], pred)

    if palette:
        colors: list[int] = []
        index: dict[int, int] = {}
        for p in px:
            if p not in index:
                index[p] = len(colors)
                colors.append(p)
        if len(colors) > 256:
            raise ValueError(f"{len(colors)} distinct colors: palette needs <= 256")
        n = len(colors)
        bw.write(1, 1)
        bw.write(3, 2)
        bw.write(n - 1, 8)
        pbits = 0 if n > 16 else 1 if n > 4 else 2 if n > 2 else 3
        deltas = []
        prev = 0
        for c in colors:
            deltas.append(_sub_px(c, prev))
            prev = c
        _encode_core(bw, deltas, n, 1)
        packed_w = _sub_size(width, pbits)
        per = 1 << pbits
        bpp = 8 >> pbits
        packed = []
        for y in range(height):
            for bx in range(packed_w):
                green = 0
                for j in range(per):
                    x = bx * per + j
                    if x < width:
                        green |= index[px[y * width + x]] << (j * bpp)
                packed.append((0xFF << 24) | (green << 8))
        px = packed
        xsize = packed_w

    bw.write(0, 1)  # end of transforms
    _encode_core(
        bw, px, xsize, height, cache_bits=cache_bits, lz77=lz77,
        mapped_distances=mapped_distances, meta_bits=meta_bits,
        n_groups=n_groups, level0=True,
    )
    body = bw.done()
    chunk = b"VP8L" + struct.pack("<I", len(body)) + body
    if len(body) & 1:
        chunk += b"\x00"
    return b"RIFF" + struct.pack("<I", 4 + len(chunk)) + b"WEBP" + chunk
