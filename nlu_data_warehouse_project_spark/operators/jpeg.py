"""Pure-stdlib+numpy JPEG codec (VERDICT r12 #6; progressive r14).

JPEG is the highest-volume crawl image format; this module decodes
BASELINE sequential JPEG (SOF0/SOF1: Huffman entropy coding, 8-bit
samples, single interleaved scan OR spec-legal per-component
multi-scan, optional restart intervals, any integer chroma
subsampling) AND PROGRESSIVE JPEG (SOF2: spectral selection,
successive approximation, DC/AC first and refinement scans, EOB
runs) with no codec library, the ``decode_png`` discipline — at
sample precision 8 or 12 (12-bit output is scaled /16 into the
uint8 pixels contract).  Round 15 adds LOSSLESS JPEG (SOF3, Annex
H: predictors 1-7, mod-2^16 differences, category-16 special,
precision 2-16 with ``raw_planes`` carrying the full-precision
integers) — the DICOM/DNG export shape.  Round 16 closes the last
SOF3 corner cases: point transform != 0, restart intervals in
lossless scans, and interleaved subsampled components.
Arithmetic-coded and hierarchical variants stay explicit
``NotImplementedError`` fail-fasts.

``encode_jpeg`` / ``encode_jpeg_progressive`` are the fixture/export
twins: minimal encoders (flat quantization by default, per-image
fixed-length canonical Huffman tables) that emit spec-valid files —
they exist so tests can round-trip every decoder path without any
image library in the container, exactly like ``encode_png``.  The
strongest correctness check is cross-form: a progressive file and a
baseline file of the same image carry the SAME quantized
coefficients in different entropy layouts, so their decodes must be
pixel-IDENTICAL — the test suite pins that equality across scan
scripts, subsampling and quantizer steps.

Scale note (same as the PNG path): decode runs as the Python side of
an Arrow-batched ``mapInPandas`` — one batch per partition, payloads
never shuffled — so the 100 TB shape is set by the batching, not by
this per-image loop.  The 8x8 DCT/IDCT is numpy (one matrix triple
product per block); entropy coding is plain Python over the batch.
"""

from __future__ import annotations

import math

import numpy as np


def _zigzag_order() -> list[int]:
    """Stream position -> raster index, generated (not typed) from the
    spec's diagonal walk: odd anti-diagonals run top-right to
    bottom-left, even ones the reverse."""
    out = []
    for s in range(15):
        rng = range(max(0, s - 7), min(s, 7) + 1)
        for r in (rng if s % 2 else reversed(rng)):
            out.append(r * 8 + (s - r))
    return out


_ZIGZAG = _zigzag_order()

# DCT-II basis: A[u, x] = 0.5 * c(u) * cos((2x+1) u pi / 16);
# FDCT of block X is A @ X @ A.T, IDCT of coeffs F is A.T @ F @ A
_DCT_A = np.array(
    [
        [
            0.5 * (1.0 / math.sqrt(2.0) if u == 0 else 1.0)
            * math.cos((2 * x + 1) * u * math.pi / 16.0)
            for x in range(8)
        ]
        for u in range(8)
    ]
)


class _BitWriter:
    """MSB-first bit accumulator with JPEG 0xFF byte stuffing."""

    def __init__(self) -> None:
        self.buf = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, value: int, bits: int) -> None:
        for i in reversed(range(bits)):
            self.acc = (self.acc << 1) | ((value >> i) & 1)
            self.n += 1
            if self.n == 8:
                self.buf.append(self.acc)
                if self.acc == 0xFF:
                    self.buf.append(0x00)
                self.acc = 0
                self.n = 0

    def flush(self) -> None:
        while self.n:
            self.write(1, 1)  # pad with 1-bits per the spec


class _BitReader:
    """MSB-first bit reader over already de-stuffed scan bytes."""

    def __init__(self, data: bytes) -> None:
        self.data = data
        self.pos = 0
        self.acc = 0
        self.n = 0

    def bit(self) -> int:
        if self.n == 0:
            if self.pos >= len(self.data):
                raise ValueError("JPEG scan data exhausted mid-block")
            self.acc = self.data[self.pos]
            self.pos += 1
            self.n = 8
        self.n -= 1
        return (self.acc >> self.n) & 1

    def bits(self, k: int) -> int:
        v = 0
        for _ in range(k):
            v = (v << 1) | self.bit()
        return v


def _canonical_codes(bits: list[int], vals: list[int]) -> dict:
    """DHT (BITS, HUFFVAL) -> {(length, code): symbol} per the spec's
    canonical code construction."""
    table: dict = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            table[(length, code)] = vals[k]
            code += 1
            k += 1
        code <<= 1
    return table


def _huff_decode(rd: _BitReader, table: dict) -> int:
    code = 0
    for length in range(1, 17):
        code = (code << 1) | rd.bit()
        sym = table.get((length, code))
        if sym is not None:
            return sym
    raise ValueError("invalid JPEG Huffman code")


def _extend(v: int, s: int) -> int:
    """DC/AC magnitude bits -> signed value (spec's EXTEND)."""
    return v - (1 << s) + 1 if s and v < (1 << (s - 1)) else v


def _comp_blocks(comp: dict, w: int, h: int, hmax: int, vmax: int) -> tuple[int, int]:
    """Block-grid dimensions of one component for NON-INTERLEAVED scans
    (spec A.2.2): component size is ceil(dim * sampling / max), blocks
    are ceil(that / 8) — which can be smaller than the MCU-padded grid
    an interleaved scan walks."""
    cw = -(-(w * comp["h"]) // hmax)
    ch = -(-(h * comp["v"]) // vmax)
    return -(-cw // 8), -(-ch // 8)



def _parse_dqt(seg: bytes, qt: dict) -> None:
    """DQT segment -> 8x8 raster tables into ``qt`` (8- or 16-bit
    precision entries, zigzag order per the spec)."""
    i = 0
    while i < len(seg):
        pq, tq = seg[i] >> 4, seg[i] & 15
        i += 1
        n = 64 * (2 if pq else 1)
        raw = seg[i:i + n]
        vals = (
            [v for v in raw] if pq == 0
            else [int.from_bytes(raw[j:j + 2], "big") for j in range(0, n, 2)]
        )
        t = np.ones((8, 8))
        for k, zz in enumerate(_ZIGZAG):
            t[zz // 8][zz % 8] = vals[k]
        qt[tq] = t
        i += n


def _parse_dht(seg: bytes, huff: dict) -> None:
    """DHT segment -> canonical code tables into ``huff`` (tables may
    be redefined between scans/frames; last definition wins)."""
    i = 0
    while i < len(seg):
        tc, th = seg[i] >> 4, seg[i] & 15
        bits = list(seg[i + 1:i + 17])
        n = sum(bits)
        vals = list(seg[i + 17:i + 17 + n])
        huff[(tc, th)] = _canonical_codes(bits, vals)
        i += 17 + n


def _dct_frame_planes(coefs, comps, qt, geo, w, h, precision,
                      level_shift: bool = True):
    """Dequantize + IDCT one DCT frame's coefficient grids into
    full-resolution float sample planes (nearest-neighbor upsample of
    subsampled components, cropped to (h, w)).  ``level_shift=False``
    is the DIFFERENTIAL-frame form (hierarchical mode, T.81 J): no
    +2^(P-1) — the IDCT output is a signed correction added to the
    upsampled reference."""
    mcux, mcuy, hmax, vmax = geo
    out_planes = []
    for ci, comp in enumerate(comps):
        if comp["tq"] not in qt:
            raise ValueError(f"JPEG missing quantization table {comp['tq']}")
        fy, fx = vmax // comp["v"], hmax // comp["h"]
        if fy * comp["v"] != vmax or fx * comp["h"] != hmax:
            raise NotImplementedError(
                f"JPEG non-integer subsampling ratio {comp['h']}x{comp['v']} "
                f"vs max {hmax}x{vmax}"
            )
        zz = coefs[ci].astype(float)
        raster = np.zeros_like(zz)
        raster[:, :, _ZIGZAG] = zz  # stream position k -> raster index
        by, bx = zz.shape[0], zz.shape[1]
        blocks = raster.reshape(by, bx, 8, 8) * qt[comp["tq"]]
        px = np.einsum("ij,abjk,kl->abil", _DCT_A.T, blocks, _DCT_A)
        p = px.transpose(0, 2, 1, 3).reshape(by * 8, bx * 8)
        if level_shift:
            p = p + float(1 << (precision - 1))
        if fy > 1 or fx > 1:
            p = np.repeat(np.repeat(p, fy, axis=0), fx, axis=1)
        out_planes.append(p[:h, :w])
    return out_planes


def _decode_block(rd, blk, huff, dc_id, ac_id, ss, se, ah, al, pred, ci, eobrun):
    """Entropy-decode one block's contribution for the current scan
    into the zigzag coefficient vector ``blk``.  Covers all four
    progressive scan kinds (DC/AC x first/refinement) AND baseline
    (ss=0, se=63, ah=al=0 — the AC-first path with al=0 IS baseline
    AC: the EOB symbol is just an EOB-run of 1).  Returns the
    end-of-band run carried to the next block."""
    if ss == 0:
        if ah == 0:
            s = _huff_decode(rd, huff[(0, dc_id)])
            pred[ci] += _extend(rd.bits(s), s)
            blk[0] = pred[ci] << al
        elif rd.bit():
            blk[0] |= 1 << al
    if se == 0:
        return eobrun
    act = huff[(1, ac_id)]
    k = max(ss, 1)
    if ah == 0:  # first pass (or baseline)
        if eobrun > 0:
            return eobrun - 1
        while k <= se:
            rs = _huff_decode(rd, act)
            r, s = rs >> 4, rs & 15
            if s == 0:
                if r < 15:  # EOBn: band ends here for 2^r + bits blocks
                    eobrun = (1 << r) - 1
                    if r:
                        eobrun += rd.bits(r)
                    break
                k += 16  # ZRL
                continue
            k += r
            if k > se:
                raise ValueError("JPEG AC run past band end")
            blk[k] = _extend(rd.bits(s), s) << al
            k += 1
        return eobrun
    # AC refinement (ah > 0): correction bits for already-nonzero
    # coefficients, newly appearing +-1<<al coefficients, EOB runs
    p1, m1 = 1 << al, -(1 << al)
    if eobrun == 0:
        while k <= se:
            rs = _huff_decode(rd, act)
            r, s = rs >> 4, rs & 15
            if s == 0:
                if r < 15:
                    # unlike the first pass, the EOB run INCLUDES the
                    # current block: its remaining band still carries
                    # one correction bit per nonzero-history coeff,
                    # consumed by the walk below before decrementing
                    eobrun = 1 << r
                    if r:
                        eobrun += rd.bits(r)
                    break
                val = 0  # ZRL: skip 16 zero-history positions
            else:
                if s != 1:
                    raise ValueError("JPEG AC refinement magnitude must be 1")
                val = p1 if rd.bit() else m1
            while k <= se:
                if blk[k] != 0:
                    # history coefficient: one correction bit
                    if rd.bit() and (blk[k] & p1) == 0:
                        blk[k] += p1 if blk[k] > 0 else m1
                else:
                    if r == 0:
                        break
                    r -= 1
                k += 1
            if val and k <= se:
                blk[k] = val
            k += 1
    if eobrun > 0:
        # inside an EOB run: still one correction bit per nonzero
        while k <= se:
            if blk[k] != 0:
                if rd.bit() and (blk[k] & p1) == 0:
                    blk[k] += p1 if blk[k] > 0 else m1
            k += 1
        eobrun -= 1
    return eobrun


def _decode_scan(payload, data_at, comps, coefs, huff, restart, scan,
                 ss, se, ah, al, progressive, geo, w, h) -> int:
    """Decode one scan's entropy data into the coefficient arrays;
    returns the payload offset of the marker that ended the scan."""
    mcux, mcuy, hmax, vmax = geo
    segs: list[bytearray] = [bytearray()]
    i = data_at
    while i < len(payload):
        b = payload[i]
        if b == 0xFF and i + 1 < len(payload):
            m = payload[i + 1]
            if m == 0x00:
                segs[-1].append(0xFF)
                i += 2
                continue
            if 0xD0 <= m <= 0xD7:
                segs.append(bytearray())
                i += 2
                continue
            if m == 0xFF:
                # ADVICE r14: spec-legal 0xFF FILL bytes may pad the
                # space before the marker that ends the scan (T.81
                # B.1.1.2) — skip the run so the caller's parser lands
                # on the real 0xFF <marker> pair, not on padding it
                # would misread as a segment header
                i += 1
                continue
            break  # next real marker ends the scan
        segs[-1].append(b)
        i += 1
    if progressive:
        if ss == 0 and se != 0:
            raise ValueError("progressive DC scan must have Se=0")
        if ss > 0 and len(scan) != 1:
            raise ValueError("progressive AC scan must be single-component")
    interleaved = len(scan) > 1
    if interleaved:
        nunits = mcux * mcuy
    else:
        bw, bh = _comp_blocks(comps[scan[0][0]], w, h, hmax, vmax)
        nunits = bw * bh
    rd = _BitReader(bytes(segs[0]))
    seg_i = 0
    pred = [0] * len(comps)
    eobrun = 0
    for unit in range(nunits):
        if restart and unit and unit % restart == 0:
            seg_i += 1
            if seg_i >= len(segs):
                raise ValueError("JPEG restart interval set but RST markers missing")
            rd = _BitReader(bytes(segs[seg_i]))
            pred = [0] * len(comps)
            eobrun = 0
        if interleaved:
            my, mx = divmod(unit, mcux)
            for ci, dc_id, ac_id in scan:
                c = comps[ci]
                for by in range(c["v"]):
                    for bx in range(c["h"]):
                        eobrun = _decode_block(
                            rd, coefs[ci][my * c["v"] + by, mx * c["h"] + bx],
                            huff, dc_id, ac_id, ss, se, ah, al, pred, ci, eobrun,
                        )
        else:
            ci, dc_id, ac_id = scan[0]
            by, bx = divmod(unit, bw)
            eobrun = _decode_block(
                rd, coefs[ci][by, bx], huff, dc_id, ac_id,
                ss, se, ah, al, pred, ci, eobrun,
            )
    return i


def _decode_lossless_scan(payload, data_at, comps, huff, scan, pred_sel,
                          pt, w, h, restart, precision, planes,
                          differential: bool = False) -> int:
    """Lossless JPEG (SOF3, T.81 Annex H) scan decode: per sample, a
    DC-class Huffman category + EXTEND bits give the difference from
    a neighbor prediction; samples reconstruct exactly (mod 2^16).
    Predictors 1-7 per the spec (Ra left, Rb above, Rc above-left);
    the first sample predicts 2^(P-Pt-1), each row's first sample
    predicts Rb, each row's later samples on row 0 predict Ra.

    Round 16 closes the three corner-case fail-fasts (VERDICT r15 #2
    of the what's-missing list):

    - POINT TRANSFORM Pt != 0 (H.1.2.1): coding runs in the
      right-shifted sample domain (default prediction 2^(P-Pt-1));
      the decoder output is the reconstructed value << Pt (H.2.2).
    - RESTART INTERVALS (H.2.3): the entropy stream splits at RSTn
      markers (cyclic index validated, byte-aligned by construction);
      at each restart the entropy decoder reinitializes and every scan
      component's NEXT sample predicts the default, exactly as at
      start of scan — the PVRG/libjpeg-lossless interpretation, which
      the fixture encoder mirrors bit-for-bit.  CAVEAT: T.81 H.2.3 is
      ambiguous and some codecs read a restart as a FRESH SCAN per
      interval (row-0 samples after the restart predict Ra within the
      interval rather than referencing pre-restart neighbors); a
      foreign SOF3+DRI payload written under that reading decodes
      here without error but with wrong pixels past the first restart.
      When an external codec is available, cross-validate a real
      DICOM/DNG restart-interval payload before trusting foreign
      SOF3+DRI streams.
    - SUBSAMPLED COMPONENTS (interleaved scans): MCU traversal with
      h_i x v_i samples per component per MCU (A.2.3 applied to
      samples), component rasters padded to the MCU grid and cropped
      by the caller; prediction reads the component's OWN raster,
      whose neighbors are always decoded before they are referenced
      in MCU order.

    Returns the payload offset after the scan's entropy data."""
    if differential:
        # T.81 J: a differential lossless frame codes the corrections
        # themselves — predictor selection SHALL be 0 (no prediction)
        if pred_sel != 0:
            raise ValueError(
                f"differential lossless JPEG requires Ss=0, got {pred_sel}"
            )
    elif pred_sel < 1 or pred_sel > 7:
        raise ValueError(f"lossless JPEG predictor {pred_sel} (1-7 defined)")
    if not 0 <= pt < precision:
        raise ValueError(f"lossless JPEG point transform {pt} (0..P-1)")
    for ci, _dc, _ac in scan:
        if (0, _dc) not in huff:
            raise ValueError(f"lossless JPEG SOS references missing DC table {_dc}")
    # de-stuff entropy bytes into segments split at RST markers; the
    # cyclic index is validated so a dropped restart is a loud error
    segments: list[bytes] = []
    cur = bytearray()
    rst_seen = 0
    i = data_at
    while i < len(payload):
        b = payload[i]
        if b == 0xFF and i + 1 < len(payload):
            m = payload[i + 1]
            if m == 0x00:
                cur.append(0xFF)
                i += 2
                continue
            if m == 0xFF:
                i += 1
                continue
            if 0xD0 <= m <= 0xD7:
                if not restart:
                    raise ValueError("lossless JPEG RST marker without DRI")
                if m - 0xD0 != rst_seen % 8:
                    raise ValueError(
                        f"lossless JPEG RST{m - 0xD0} out of order "
                        f"(expected RST{rst_seen % 8})"
                    )
                segments.append(bytes(cur))
                cur = bytearray()
                rst_seen += 1
                i += 2
                continue
            break
        cur.append(b)
        i += 1
    segments.append(bytes(cur))

    rd = _BitReader(segments[0])
    seg_idx = 0
    default = 1 << (precision - 1 - pt)
    mask = 0xFFFF  # spec H.1.2.1: reconstruction is modulo 2^16
    # per-scan-component "predict default next" flags (start of scan /
    # after each restart)
    fresh = {ci: True for ci, _dc, _ac in scan}

    def decode_sample(ci, dc_id, plane, y, x):
        nonlocal_fresh = fresh[ci]
        s_cat = _huff_decode(rd, huff[(0, dc_id)])
        if s_cat == 16:  # special category: diff = 32768, no bits
            diff = 32768
        elif s_cat:
            diff = _extend(rd.bits(s_cat), s_cat)
        else:
            diff = 0
        if differential:
            plane[y, x] = diff & mask  # no prediction: the value IS the code
            return
        if nonlocal_fresh:
            pred = default
            fresh[ci] = False
        elif y == 0 and x == 0:
            pred = default
        elif y == 0:
            pred = int(plane[0, x - 1])
        elif x == 0:
            pred = int(plane[y - 1, 0])
        else:
            ra = int(plane[y, x - 1])
            rb = int(plane[y - 1, x])
            rc = int(plane[y - 1, x - 1])
            pred = (
                ra if pred_sel == 1 else
                rb if pred_sel == 2 else
                rc if pred_sel == 3 else
                ra + rb - rc if pred_sel == 4 else
                ra + ((rb - rc) >> 1) if pred_sel == 5 else
                rb + ((ra - rc) >> 1) if pred_sel == 6 else
                (ra + rb) >> 1
            )
        plane[y, x] = (pred + diff) & mask

    def advance_restart():
        nonlocal rd, seg_idx
        seg_idx += 1
        if seg_idx >= len(segments):
            raise ValueError(
                f"lossless JPEG: DRI promises a restart after {restart} "
                f"MCUs but segment {seg_idx} is missing"
            )
        rd = _BitReader(segments[seg_idx])
        for ci, _dc, _ac in scan:
            fresh[ci] = True

    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    if len(scan) > 1:
        # interleaved: MCU grid over the frame, h_i x v_i samples per
        # component per MCU (order: component, then dy, then dx)
        mcux = -(-w // hmax)
        mcuy = -(-h // vmax)
        mcu_n = 0
        for my in range(mcuy):
            for mx in range(mcux):
                if restart and mcu_n and mcu_n % restart == 0:
                    advance_restart()
                mcu_n += 1
                for ci, dc_id, _ac in scan:
                    c = comps[ci]
                    for dy in range(c["v"]):
                        for dx in range(c["h"]):
                            decode_sample(
                                ci, dc_id, planes[ci],
                                my * c["v"] + dy, mx * c["h"] + dx,
                            )
    else:
        # non-interleaved: one MCU = one sample, raster over the
        # component's own dimensions (no MCU padding)
        ci, dc_id, _ac = scan[0]
        c = comps[ci]
        cw = -(-w * c["h"] // hmax)
        ch = -(-h * c["v"] // vmax)
        mcu_n = 0
        for y in range(ch):
            for x in range(cw):
                if restart and mcu_n and mcu_n % restart == 0:
                    advance_restart()
                mcu_n += 1
                decode_sample(ci, dc_id, planes[ci], y, x)
    if pt:
        # H.2.2: decoder output = reconstructed (shifted-domain)
        # value << Pt; shift once per scan, each component appears in
        # exactly one scan
        for ci, _dc, _ac in scan:
            planes[ci] <<= pt
    return i


def decode_jpeg(payload: bytes) -> dict:
    """Decode a baseline OR progressive JPEG to row-major 8-bit
    samples.  Returns ``{format, width, height, channels, pixels}``
    like ``decode_png`` (channels 1 for grayscale, 3 for YCbCr color
    converted to RGB with the JFIF coefficients).

    Handles: SOF0/SOF1 baseline (single interleaved scan OR spec-legal
    per-component multi-scan), SOF2 progressive (spectral selection +
    successive approximation, DC and AC first/refinement scans, EOB
    runs), SOF3 lossless (predictors 1-7, precision 2-16, point
    transform, subsampled components; adds ``raw_planes``/``bits``
    keys for full-precision consumers), restart intervals in any
    scan, integer chroma subsampling.
    Arithmetic-coded and hierarchical variants stay explicit
    fail-fasts.

    ERROR CONTRACT (pinned by the truncation fuzz): malformed or
    truncated payloads raise ValueError (or NotImplementedError for
    recognized-but-unsupported variants) — never an internal
    IndexError/struct.error from a short slice."""
    import struct as _struct

    try:
        return _decode_jpeg_checked(payload, _struct)
    except (IndexError, _struct.error) as exc:
        raise ValueError(
            f"JPEG payload truncated/corrupt ({type(exc).__name__}: {exc})"
        ) from exc


def _decode_jpeg_checked(payload: bytes, _struct) -> dict:

    if not isinstance(payload, (bytes, bytearray)) or payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload")
    qt: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], dict] = {}  # (class 0=DC/1=AC, id) -> table
    comps: list[dict] = []
    w = h = 0
    restart = 0
    precision = 8
    progressive = False
    lossless = False
    adobe_transform: int | None = None
    lplanes: list[np.ndarray] | None = None
    coefs: list[np.ndarray] | None = None
    geo: tuple[int, int, int, int] | None = None
    saw_scan = False
    pos = 2
    while pos + 2 <= len(payload):
        if payload[pos] != 0xFF:
            raise ValueError(f"JPEG marker expected at {pos}")
        marker = payload[pos + 1]
        if marker == 0xFF:  # 0xFF fill byte run before a marker (B.1.1.2)
            pos += 1
            continue
        if marker == 0xD9:  # EOI
            break
        if marker == 0x01 or 0xD0 <= marker <= 0xD7:  # TEM / stray RST
            pos += 2
            continue
        if pos + 4 > len(payload):
            break
        (seglen,) = _struct.unpack(">H", payload[pos + 2:pos + 4])
        seg = payload[pos + 4:pos + 2 + seglen]
        if marker == 0xDE:  # DHP: hierarchical image — dedicated loop
            return _decode_hierarchical(payload, _struct)
        if marker == 0xDB:  # DQT
            _parse_dqt(seg, qt)
        elif marker == 0xC4:  # DHT (tables may be redefined between scans)
            _parse_dht(seg, huff)
        elif marker in (0xC0, 0xC1, 0xC2, 0xC3):  # SOF0/1/2 + SOF3 lossless
            if comps:
                raise ValueError("JPEG with more than one SOF")
            lossless = marker == 0xC3
            if lossless:
                if not 2 <= seg[0] <= 16:
                    raise ValueError(f"lossless JPEG precision {seg[0]} (2-16)")
            elif seg[0] not in (8, 12):
                raise NotImplementedError(
                    f"JPEG sample precision {seg[0]} (8 and 12 decode here)"
                )
            precision = seg[0]
            progressive = marker == 0xC2
            h = int.from_bytes(seg[1:3], "big")
            w = int.from_bytes(seg[3:5], "big")
            for c in range(seg[5]):
                cid, hv, tq = seg[6 + c * 3:9 + c * 3]
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 15, "tq": tq})
        elif marker in (0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                        0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                f"JPEG SOF{marker - 0xC0}: Huffman baseline (SOF0/SOF1), "
                "progressive (SOF2), lossless (SOF3) and the hierarchical "
                "lossless pyramid (DHP + SOF3/SOF7) decode here — a "
                "differential frame without DHP is malformed; arithmetic "
                "and DCT-differential payloads fail fast"
            )
        elif marker == 0xDD:  # DRI
            restart = int.from_bytes(seg[0:2], "big")
        elif marker == 0xEE and seg[:5] == b"Adobe" and len(seg) >= 12:
            adobe_transform = seg[11]  # 0=raw, 1=YCbCr, 2=YCCK
        elif marker == 0xDA:  # SOS — decode this scan, keep parsing after
            if not comps or w == 0 or h == 0:
                raise ValueError("JPEG SOS before SOF")
            if lossless:
                if lplanes is None:
                    # padded to the MCU grid: interleaved subsampled
                    # scans code h_i x v_i samples per MCU including
                    # edge padding; cropped to true dims at output
                    lm = max(c["h"] for c in comps)
                    vm = max(c["v"] for c in comps)
                    lplanes = [
                        np.zeros(
                            (-(-h // vm) * c["v"], -(-w // lm) * c["h"]),
                            dtype=np.int64,
                        )
                        for c in comps
                    ]
                ns = seg[0]
                scan = []
                for c in range(ns):
                    cs, tdta = seg[1 + c * 2:3 + c * 2]
                    idx = next(
                        i for i, comp in enumerate(comps) if comp["id"] == cs
                    )
                    scan.append((idx, tdta >> 4, tdta & 15))
                ss, se, ahal = seg[1 + 2 * ns:4 + 2 * ns]
                pos = _decode_lossless_scan(
                    payload, pos + 2 + seglen, comps, huff, scan,
                    ss, ahal & 15, w, h, restart, precision, lplanes,
                )
                saw_scan = True
                continue
            if coefs is None:
                hmax = max(c["h"] for c in comps)
                vmax = max(c["v"] for c in comps)
                geo = (-(-w // (8 * hmax)), -(-h // (8 * vmax)), hmax, vmax)
                coefs = [
                    np.zeros((geo[1] * c["v"], geo[0] * c["h"], 64), dtype=np.int64)
                    for c in comps
                ]
            ns = seg[0]
            scan = []
            for c in range(ns):
                cs, tdta = seg[1 + c * 2:3 + c * 2]
                idx = next(i for i, comp in enumerate(comps) if comp["id"] == cs)
                scan.append((idx, tdta >> 4, tdta & 15))
            ss, se, ahal = seg[1 + 2 * ns:4 + 2 * ns]
            for _ci, _dc, _ac in scan:
                # truncated/corrupt payloads can reach SOS with the
                # tables it references missing — fail fast with a
                # message instead of a KeyError from the block loop
                if ss == 0 and (ahal >> 4) == 0 and (0, _dc) not in huff:
                    raise ValueError(f"JPEG SOS references missing DC table {_dc}")
                if se > 0 and (1, _ac) not in huff:
                    raise ValueError(f"JPEG SOS references missing AC table {_ac}")
            pos = _decode_scan(
                payload, pos + 2 + seglen, comps, coefs, huff, restart,
                scan, ss, se, ahal >> 4, ahal & 15, progressive, geo, w, h,
            )
            saw_scan = True
            continue
        pos += 2 + seglen
    if not saw_scan or (coefs is None and lplanes is None):
        raise ValueError("JPEG missing SOF/SOS")

    if lossless:
        # lossless color has no standard YCbCr convention (T.81 defines
        # no transform for SOF3; DNG/DICOM store components raw) — the
        # planes ARE the samples.  P > 8 scales into the uint8 pixels
        # contract like the 12-bit DCT path; ``raw_planes`` carries the
        # full-precision integers for numeric consumers/tests.
        # Subsampled components crop to their true dims then replicate
        # to full resolution (the DCT path's nearest-neighbor rule).
        lm = max(c["h"] for c in comps)
        vm = max(c["v"] for c in comps)
        full = []
        for ci, c in enumerate(comps):
            cw = -(-w * c["h"] // lm)
            ch2 = -(-h * c["v"] // vm)
            p = lplanes[ci][:ch2, :cw]
            fy, fx = vm // c["v"], lm // c["h"]
            if fy * c["v"] != vm or fx * c["h"] != lm:
                raise NotImplementedError(
                    f"JPEG non-integer subsampling ratio {c['h']}x{c['v']} "
                    f"vs max {lm}x{vm}"
                )
            if fy > 1 or fx > 1:
                p = np.repeat(np.repeat(p, fy, axis=0), fx, axis=1)
            full.append(p[:h, :w])
        raw = np.stack(full, axis=2)
        shift = max(0, precision - 8)
        px8 = np.clip(raw >> shift if shift else raw, 0, 255).astype(np.uint8)
        return {
            "format": "jpeg", "width": w, "height": h,
            "channels": len(comps), "pixels": px8.tobytes(),
            "raw_planes": raw, "bits": precision,
        }

    out_planes = _dct_frame_planes(coefs, comps, qt, geo, w, h, precision)
    if precision == 12:
        # 12-bit samples land on 0..4095; scaled /16 into the 8-bit
        # output contract (the pixels field stays uint8 — documented)
        out_planes = [p / 16.0 for p in out_planes]
    if len(comps) == 1:
        rgb = out_planes[0][:, :, None]
        channels = 1
    elif len(comps) == 3:
        if adobe_transform == 0:
            # ADVICE r14: Adobe APP14 transform 0 declares the three
            # components are stored RAW (RGB samples, no YCbCr) — the
            # JFIF color transform would silently wreck the colors
            rgb = np.stack(out_planes, axis=2)
        else:
            # JFIF default and Adobe transform 1: YCbCr
            y, cb, cr = out_planes
            rgb = np.stack(
                [
                    y + 1.402 * (cr - 128.0),
                    y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0),
                    y + 1.772 * (cb - 128.0),
                ],
                axis=2,
            )
        channels = 3
    elif len(comps) == 4:
        # Adobe 4-component JPEG: return raw CMYK samples (channels=4),
        # converting YCCK (APP14 transform 2) back to CMYK first — the
        # stored YCC planes are the YCbCr transform of the INVERTED
        # C/M/Y, so C = 255 - R' etc.  No ICC color management and no
        # ink-inversion guesswork here: downstream featurization reads
        # raw component statistics, which is what it gets.
        if adobe_transform == 2:
            y, cb, cr, kk = out_planes
            rgb = np.stack(
                [
                    255.0 - (y + 1.402 * (cr - 128.0)),
                    255.0 - (y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)),
                    255.0 - (y + 1.772 * (cb - 128.0)),
                    kk,
                ],
                axis=2,
            )
        else:
            rgb = np.stack(out_planes, axis=2)
        channels = 4
    else:
        raise NotImplementedError(f"JPEG with {len(comps)} components")
    pixels = np.clip(np.round(rgb), 0, 255).astype(np.uint8).tobytes()
    return {
        "format": "jpeg", "width": w, "height": h,
        "channels": channels, "pixels": pixels,
    }


def _build_huffman(symbol_sets: list[set]) -> list[tuple[list[int], list[int]]]:
    """One fixed-length canonical code per table: n symbols all at
    length L = bit_length(n), so 2^L > n and the all-ones code stays
    unassigned (the spec's reserved-code rule).  Deliberately
    compression-free — the encoder exists for fixtures, and a trivial
    complete prefix code removes the Annex-K table-transcription risk
    entirely (the decoder reads whatever DHT says)."""
    out = []
    for syms in symbol_sets:
        vals = sorted(syms) if syms else [0]
        n = len(vals)
        length = max(1, n.bit_length())
        bits = [0] * 16
        bits[length - 1] = n
        out.append((bits, vals))
    return out


def _fdct_quant(plane: np.ndarray, q: np.ndarray, y0: int, x0: int,
                level: float = 128.0) -> list[int]:
    block = plane[y0:y0 + 8, x0:x0 + 8] - level
    coef = np.round((_DCT_A @ block @ _DCT_A.T) / q).astype(int)
    return [int(coef.flat[z]) for z in _ZIGZAG]


def _block_symbols(zz: list[int], pred: int) -> tuple[list, int]:
    """(DC size sym, bits) + AC (run/size sym, bits) stream for one
    quantized zigzag block; returns the tokens and the new DC pred."""
    tokens = []
    diff = zz[0] - pred
    s = abs(diff).bit_length()
    tokens.append(("dc", s, diff if diff >= 0 else diff + (1 << s) - 1))
    run = 0
    last = max((k for k in range(1, 64) if zz[k]), default=0)
    for k in range(1, last + 1):
        if zz[k] == 0:
            run += 1
            continue
        while run > 15:
            tokens.append(("ac", 0xF0, 0))
            run -= 16
        s = abs(zz[k]).bit_length()
        v = zz[k] if zz[k] >= 0 else zz[k] + (1 << s) - 1
        tokens.append(("ac", (run << 4) | s, v))
        run = 0
    if last < 63:
        tokens.append(("ac", 0x00, 0))
    return tokens, zz[0]


def encode_jpeg(
    width: int,
    height: int,
    channels: int,
    pixels: bytes,
    quant: int = 1,
    subsample_420: bool = False,
    restart_interval: int = 0,
    ycck: bool = False,
    adobe_rgb: bool = False,
) -> bytes:
    """Minimal baseline JPEG encoder — ``encode_png``'s lossy sibling.
    ``quant`` is a single flat quantizer step for every coefficient
    (1 = near-lossless up to DCT rounding); ``subsample_420`` emits
    2x2-subsampled chroma (box mean); ``restart_interval`` > 0 emits
    DRI + RSTn markers every that many MCUs.  ``channels=4`` writes an
    Adobe CMYK file (APP14 transform 0: raw component samples;
    ``ycck=True`` stores the YCbCr transform of the inverted C/M/Y +
    K, APP14 transform 2).  ``adobe_rgb=True`` with ``channels=3``
    stores the three planes RAW and stamps APP14 transform 0 — the
    Adobe-RGB shape whose decode ADVICE r14 fixed (previously the
    JFIF YCbCr transform was applied unconditionally).  Huffman
    tables are per-image canonical fixed-length codes (see
    ``_build_huffman``)."""
    import struct as _struct

    if channels not in (1, 3, 4):
        raise ValueError(f"encode_jpeg writes 1, 3 or 4 channels, got {channels}")
    if ycck and channels != 4:
        raise ValueError("ycck=True requires channels=4 (CMYK input)")
    if adobe_rgb and (channels != 3 or subsample_420):
        raise ValueError("adobe_rgb=True requires channels=3, full-res planes")
    if subsample_420 and channels == 4:
        raise ValueError("subsample_420 is only supported for channels=3")
    if len(pixels) != width * height * channels:
        raise ValueError(f"need {width * height * channels} bytes, got {len(pixels)}")
    img = np.frombuffer(bytes(pixels), dtype=np.uint8).reshape(
        height, width, channels
    ).astype(float)
    if channels == 3:
        if adobe_rgb:
            comps_raw = [img[:, :, c] for c in range(3)]
        else:
            r, g, b = img[:, :, 0], img[:, :, 1], img[:, :, 2]
            comps_raw = [
                0.299 * r + 0.587 * g + 0.114 * b,
                128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b,
                128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b,
            ]
        hv = [(2, 2), (1, 1), (1, 1)] if subsample_420 else [(1, 1)] * 3
    elif channels == 4:
        if ycck:
            r, g, b = (255.0 - img[:, :, c] for c in range(3))
            comps_raw = [
                0.299 * r + 0.587 * g + 0.114 * b,
                128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b,
                128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b,
                img[:, :, 3],
            ]
        else:
            comps_raw = [img[:, :, c] for c in range(4)]
        hv = [(1, 1)] * 4
    else:
        comps_raw = [img[:, :, 0]]
        hv = [(1, 1)]
    hmax = max(x for x, _ in hv)
    vmax = max(y for _, y in hv)
    mcux = -(-width // (8 * hmax))
    mcuy = -(-height // (8 * vmax))
    # pad to the MCU grid by edge replication, then box-downsample chroma
    py, px = mcuy * vmax * 8, mcux * hmax * 8
    planes = []
    for (ch, cv), plane in zip(hv, comps_raw):
        p = np.pad(plane, ((0, py - height), (0, px - width)), mode="edge")
        fy, fx = vmax // cv, hmax // ch
        if fy > 1 or fx > 1:
            p = p.reshape(py // fy, fy, px // fx, fx).mean(axis=(1, 3))
        planes.append(p)

    q = np.full((8, 8), float(quant))
    # pass 1: tokenize every block (MCU-interleaved order)
    n_tables = 2 if channels >= 3 else 1  # (DC, AC) x (luma, chroma-ish)
    dc_syms: list[set] = [set() for _ in range(n_tables)]
    ac_syms: list[set] = [set() for _ in range(n_tables)]
    mcu_tokens: list[list] = []
    pred = [0] * len(planes)
    for mcu in range(mcux * mcuy):
        if restart_interval and mcu and mcu % restart_interval == 0:
            pred = [0] * len(planes)
        my, mx = divmod(mcu, mcux)
        toks: list = []
        for ci, (ch, cv) in enumerate(hv):
            t = 0 if ci == 0 else 1
            for by in range(cv):
                for bx in range(ch):
                    zz = _fdct_quant(
                        planes[ci], q, (my * cv + by) * 8, (mx * ch + bx) * 8
                    )
                    btoks, pred[ci] = _block_symbols(zz, pred[ci])
                    for kind, sym, _v in btoks:
                        (dc_syms if kind == "dc" else ac_syms)[t].add(sym)
                    toks.append((t, btoks))
        mcu_tokens.append(toks)

    tables = _build_huffman(dc_syms + ac_syms)  # dc0, [dc1], ac0, [ac1]
    # invert the canonical (length, code) -> sym map to sym -> (len, code)
    enc = []
    for bits, vals in tables:
        m = {}
        for (length, code), sym in _canonical_codes(bits, vals).items():
            m[sym] = (length, code)
        enc.append(m)

    out = bytearray(b"\xff\xd8")

    def segment(marker: int, body: bytes) -> None:
        out.extend(b"\xff" + bytes([marker]) + _struct.pack(">H", len(body) + 2) + body)

    zz_q = bytes(int(q.flat[z]) for z in _ZIGZAG)
    if channels == 4:
        # Adobe APP14: required so decoders know the 4-component
        # interpretation (transform 2 = YCCK, 0 = raw CMYK samples)
        segment(0xEE, b"Adobe" + bytes([0, 100, 0, 0, 0, 0, 2 if ycck else 0]))
    elif adobe_rgb:
        # transform 0 on 3 components: the planes are RGB as stored
        segment(0xEE, b"Adobe" + bytes([0, 100, 0, 0, 0, 0, 0]))
    segment(0xDB, b"\x00" + zz_q)  # one flat table, id 0, for all comps
    sof = b"\x08" + _struct.pack(">HH", height, width) + bytes([len(planes)])
    for ci, (ch, cv) in enumerate(hv):
        sof += bytes([ci + 1, (ch << 4) | cv, 0])
    segment(0xC0, sof)
    for ti, (bits, vals) in enumerate(tables):
        cls = 0 if ti < n_tables else 1  # DC tables first, then AC
        tid = ti % n_tables
        segment(0xC4, bytes([(cls << 4) | tid] + bits + vals))
    if restart_interval:
        segment(0xDD, _struct.pack(">H", restart_interval))
    sos = bytes([len(planes)])
    for ci in range(len(planes)):
        t = 0 if ci == 0 else 1
        sos += bytes([ci + 1, (t << 4) | t])
    sos += b"\x00\x3f\x00"
    segment(0xDA, sos)

    wtr = _BitWriter()
    rst = 0
    for mcu, toks in enumerate(mcu_tokens):
        if restart_interval and mcu and mcu % restart_interval == 0:
            wtr.flush()
            out.extend(wtr.buf)
            wtr = _BitWriter()
            out.extend(b"\xff" + bytes([0xD0 + rst % 8]))
            rst += 1
        for t, btoks in toks:
            for kind, sym, v in btoks:
                table = enc[t] if kind == "dc" else enc[n_tables + t]
                length, code = table[sym]
                wtr.write(code, length)
                s = sym & 15 if kind == "ac" else sym
                if s:
                    wtr.write(v, s)
    wtr.flush()
    out.extend(wtr.buf)
    out.extend(b"\xff\xd9")
    return bytes(out)


def _flush_eobrun(tokens: list, eobrun: int, pending: list) -> int:
    """Emit the accumulated end-of-band run as an EOBn symbol (r extra
    bits encode runs in [2^r, 2^(r+1)-1]) followed by any pending
    refinement correction bits, per the spec's AC ordering."""
    if eobrun > 0:
        r = eobrun.bit_length() - 1
        tokens.append(("h", r << 4))
        if r:
            tokens.append(("b", eobrun - (1 << r), r))
        tokens.extend(pending)
        pending.clear()
    return 0


def _encode_ac_first(tokens: list, zz: list[int], ss: int, se: int, al: int,
                     eobrun: int) -> int:
    """AC first-pass tokens for one block: point transform abs>>al with
    sign, runs/ZRL, EOB-run accumulation across blocks."""
    run = 0
    for k in range(ss, se + 1):
        mag = abs(zz[k]) >> al
        if mag == 0:
            run += 1
            continue
        eobrun = _flush_eobrun(tokens, eobrun, [])
        while run > 15:
            tokens.append(("h", 0xF0))
            run -= 16
        s = mag.bit_length()
        v = mag if zz[k] > 0 else (1 << s) - 1 - mag
        tokens.append(("h", (run << 4) | s))
        tokens.append(("b", v, s))
        run = 0
    if run > 0:
        eobrun += 1
        if eobrun == 0x7FFF:
            eobrun = _flush_eobrun(tokens, eobrun, [])
    return eobrun


def _encode_ac_refine(tokens: list, zz: list[int], ss: int, se: int, al: int,
                      eobrun: int, pending: list) -> int:
    """AC refinement tokens for one block, mirroring libjpeg's
    encode_mcu_AC_refine two-buffer discipline exactly: newly-appearing
    ±1<<al coefficients as (run, 1) symbols with a sign bit; one
    correction bit per already-nonzero (history) coefficient, buffered
    in ``cur`` and emitted after the current block's next symbol; at
    block end, unemitted ``cur`` bits fold into the scan-level
    ``pending`` buffer that rides with the EOB run (the decoder
    consumes them inside its EOB-run walk).  The ZRL guard runs at
    every nonzero position with ``k <= eob`` (runs past the last new
    coefficient fold into the EOB run instead) — the ordering the
    decoder's window walk requires."""
    absvals = [0] * (se + 1)
    eob = ss - 1  # last position where a NEW coefficient appears
    for k in range(ss, se + 1):
        absvals[k] = abs(zz[k]) >> al
        if absvals[k] == 1:
            eob = k
    run = 0
    cur: list = []  # this block's correction bits since the last symbol
    for k in range(ss, se + 1):
        mag = absvals[k]
        if mag == 0:
            run += 1
            continue
        while run > 15 and k <= eob:
            eobrun = _flush_eobrun(tokens, eobrun, pending)
            tokens.append(("h", 0xF0))
            run -= 16
            tokens.extend(cur)
            cur.clear()
        if mag > 1:
            cur.append(("b", mag & 1, 1))
            continue
        # newly appearing coefficient
        eobrun = _flush_eobrun(tokens, eobrun, pending)
        tokens.append(("h", (run << 4) | 1))
        tokens.append(("b", 1 if zz[k] > 0 else 0, 1))
        tokens.extend(cur)
        cur.clear()
        run = 0
    if run > 0 or cur:
        eobrun += 1
        pending.extend(cur)
        if eobrun == 0x7FFF:
            eobrun = _flush_eobrun(tokens, eobrun, pending)
    return eobrun


def encode_jpeg_progressive(
    width: int,
    height: int,
    channels: int,
    pixels: bytes,
    quant: int = 1,
    subsample_420: bool = False,
    scans: list[tuple] | None = None,
    sof_marker: int = 0xC2,
    precision: int = 8,
) -> bytes:
    """Progressive JPEG encoder — `encode_jpeg`'s SOF2 sibling, so the
    progressive decode paths round-trip without any image library.

    ``scans`` is a script of (comp_or_None, Ss, Se, Ah, Al) tuples
    (comp None = interleaved over all components — DC scans only).
    The default script exercises every progressive decode path: DC
    first at Al=1, banded AC first passes at Al=1, the DC refinement
    bit, and AC refinement to full precision:

        (None, 0, 0, 0, 1)           DC first, interleaved
        (ci,   1, 5, 0, 1) per comp  AC low band, first
        (ci,   6, 63, 0, 1) per comp AC high band, first
        (None, 0, 0, 1, 0)           DC refinement
        (ci,   1, 63, 1, 0) per comp AC refinement

    ``sof_marker=0xC0`` with a full-band per-component script
    ((ci, 0, 63, 0, 0) each) emits a spec-legal NON-INTERLEAVED
    BASELINE multi-scan file — the ADVICE-r13 shape, now decodable.

    Same fixture-encoder contract as ``encode_jpeg``: flat quantizer,
    per-scan fixed-length canonical Huffman tables, no restarts."""
    import struct as _struct

    if channels not in (1, 3, 4):
        raise ValueError(
            f"encode_jpeg_progressive writes 1, 3 or 4 channels, got {channels}"
        )
    if subsample_420 and channels == 4:
        raise ValueError("subsample_420 is only supported for channels=3")
    if precision not in (8, 12):
        raise ValueError(f"precision={precision} (8 or 12)")
    if precision == 12:
        # 12-bit fixtures: grayscale only (the color transform is
        # defined on the 8-bit range; the decoder handles 12-bit color
        # generically because its /16 rescale precedes the transform),
        # samples as little-endian uint16 in 0..4095
        if channels != 1:
            raise ValueError("precision=12 fixtures are grayscale (channels=1)")
        if len(pixels) != width * height * 2:
            raise ValueError(f"need {width * height * 2} bytes, got {len(pixels)}")
        img = np.frombuffer(bytes(pixels), dtype="<u2").reshape(
            height, width, 1
        ).astype(float)
        if img.max() > 4095:
            raise ValueError("12-bit samples must be in 0..4095")
    elif len(pixels) != width * height * channels:
        raise ValueError(f"need {width * height * channels} bytes, got {len(pixels)}")
    else:
        img = np.frombuffer(bytes(pixels), dtype=np.uint8).reshape(
            height, width, channels
        ).astype(float)
    if channels == 3:
        r, g, b = img[:, :, 0], img[:, :, 1], img[:, :, 2]
        comps_raw = [
            0.299 * r + 0.587 * g + 0.114 * b,
            128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b,
            128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b,
        ]
        hv = [(2, 2), (1, 1), (1, 1)] if subsample_420 else [(1, 1)] * 3
    elif channels == 4:
        comps_raw = [img[:, :, c] for c in range(4)]  # raw CMYK, APP14 transform 0
        hv = [(1, 1)] * 4
    else:
        comps_raw = [img[:, :, 0]]
        hv = [(1, 1)]
    hmax = max(x for x, _ in hv)
    vmax = max(y for _, y in hv)
    mcux = -(-width // (8 * hmax))
    mcuy = -(-height // (8 * vmax))
    py, px = mcuy * vmax * 8, mcux * hmax * 8
    planes = []
    for (ch, cv), plane in zip(hv, comps_raw):
        p = np.pad(plane, ((0, py - height), (0, px - width)), mode="edge")
        fy, fx = vmax // cv, hmax // ch
        if fy > 1 or fx > 1:
            p = p.reshape(py // fy, fy, px // fx, fx).mean(axis=(1, 3))
        planes.append(p)

    q = np.full((8, 8), float(quant))
    level = float(1 << (precision - 1))
    # quantized zigzag coefficients on the MCU-padded block grid
    zzs = []
    for ci, (ch, cv) in enumerate(hv):
        by_n, bx_n = mcuy * cv, mcux * ch
        grid = [
            [_fdct_quant(planes[ci], q, by * 8, bx * 8, level) for bx in range(bx_n)]
            for by in range(by_n)
        ]
        zzs.append(grid)

    if scans is None:
        scans = [(None, 0, 0, 0, 1)]
        for ci in range(len(hv)):
            scans.append((ci, 1, 5, 0, 1))
            scans.append((ci, 6, 63, 0, 1))
        scans.append((None, 0, 0, 1, 0))
        for ci in range(len(hv)):
            scans.append((ci, 1, 63, 1, 0))

    out = bytearray(b"\xff\xd8")

    def segment(marker: int, body: bytes) -> None:
        out.extend(b"\xff" + bytes([marker]) + _struct.pack(">H", len(body) + 2) + body)

    if channels == 4:
        segment(0xEE, b"Adobe" + bytes([0, 100, 0, 0, 0, 0, 0]))
    segment(0xDB, b"\x00" + bytes(int(q.flat[z]) for z in _ZIGZAG))
    sof = bytes([precision]) + _struct.pack(">HH", height, width) + bytes([len(planes)])
    for ci, (ch, cv) in enumerate(hv):
        sof += bytes([ci + 1, (ch << 4) | cv, 0])
    segment(sof_marker, sof)

    for comp_sel, ss, se, ahi, alo in scans:
        scan_comps = list(range(len(hv))) if comp_sel is None else [comp_sel]
        # tokenize the scan
        tokens: list = []
        pred = [0] * len(hv)
        eobrun = 0
        pending: list = []
        if comp_sel is None:  # interleaved (DC or full-band baseline)
            units = [
                (ci, my * hv[ci][1] + by, mx * hv[ci][0] + bx)
                for mcu in range(mcux * mcuy)
                for my, mx in [divmod(mcu, mcux)]
                for ci in scan_comps
                for by in range(hv[ci][1])
                for bx in range(hv[ci][0])
            ]
        else:
            bw, bh = _comp_blocks(
                {"h": hv[comp_sel][0], "v": hv[comp_sel][1]}, width, height,
                hmax, vmax,
            )
            units = [
                (comp_sel, by, bx) for by in range(bh) for bx in range(bw)
            ]
        for ci, by, bx in units:
            zz = zzs[ci][by][bx]
            if ss == 0:
                if ahi == 0:
                    dc = zz[0] >> alo  # arithmetic shift (floor), per libjpeg
                    diff = dc - pred[ci]
                    pred[ci] = dc
                    s = abs(diff).bit_length()
                    tokens.append(("hdc", s, ci))
                    if s:
                        tokens.append(
                            ("b", diff if diff >= 0 else diff + (1 << s) - 1, s)
                        )
                else:
                    tokens.append(("b", (zz[0] >> alo) & 1, 1))
            if se > 0:
                if ahi == 0:
                    eobrun = _encode_ac_first(tokens, zz, max(ss, 1), se, alo, eobrun)
                else:
                    eobrun = _encode_ac_refine(
                        tokens, zz, max(ss, 1), se, alo, eobrun, pending
                    )
                if sof_marker != 0xC2:
                    # baseline scans have no EOB-run symbols (EOBn with
                    # r>0 is progressive-only): flush per block so only
                    # plain EOB (r=0) ever hits the stream
                    eobrun = _flush_eobrun(tokens, eobrun, pending)
        _flush_eobrun(tokens, eobrun, pending)

        # per-scan fixed-length canonical tables: DC symbols per comp
        # share table 0; AC symbols share table 0
        dc_syms = {t[1] for t in tokens if t[0] == "hdc"}
        ac_syms = {t[1] for t in tokens if t[0] == "h"}
        enc_maps = {}
        dht = bytearray()
        if ss == 0 and ahi == 0:
            bits, vals = _build_huffman([dc_syms])[0]
            dht += bytes([0x00] + bits + vals)
            enc_maps["hdc"] = {
                sym: (ln, code) for (ln, code), sym in _canonical_codes(bits, vals).items()
            }
        if (se > 0 or (ss == 0 and se == 63)) and ac_syms:
            bits, vals = _build_huffman([ac_syms])[0]
            dht += bytes([0x10] + bits + vals)
            enc_maps["h"] = {
                sym: (ln, code) for (ln, code), sym in _canonical_codes(bits, vals).items()
            }
        if dht:
            segment(0xC4, bytes(dht))

        sos = bytes([len(scan_comps)])
        for ci in scan_comps:
            sos += bytes([ci + 1, 0x00])  # DC table 0, AC table 0
        sos += bytes([ss, se, (ahi << 4) | alo])
        segment(0xDA, sos)

        wtr = _BitWriter()
        for t in tokens:
            if t[0] == "hdc":
                ln, code = enc_maps["hdc"][t[1]]
                wtr.write(code, ln)
            elif t[0] == "h":
                ln, code = enc_maps["h"][t[1]]
                wtr.write(code, ln)
            else:
                _, v, nb = t
                wtr.write(v, nb)
        wtr.flush()
        out.extend(wtr.buf)

    out.extend(b"\xff\xd9")
    return bytes(out)


def encode_jpeg_lossless(
    width: int,
    height: int,
    channels: int,
    pixels: bytes,
    predictor: int = 1,
    precision: int = 8,
    pt: int = 0,
    restart_interval: int = 0,
) -> bytes:
    """Lossless JPEG (SOF3) fixture encoder — EXACT round-trip by
    construction: per sample, the Annex-H difference from the chosen
    predictor (1-7) is coded as a DC-class Huffman category + EXTEND
    bits, differences taken mod 2^16 with the spec's category-16
    special for +32768.  Components are full-resolution, interleaved
    sample-by-sample, one shared table — the DICOM/DNG-ish shape.
    ``pixels``: uint8 bytes for precision <= 8, little-endian uint16
    for 9-16.

    Round 16: ``pt`` (point transform — coding runs on samples >> pt,
    the decoder reconstructs (sample >> pt) << pt) and
    ``restart_interval`` (DRI + cyclic RSTn markers every N MCUs, the
    entropy stream byte-aligned and the predictors reset at each
    restart — the decoder's exact interpretation).  Subsampled
    fixtures go through ``encode_jpeg_lossless_planes``."""
    if not 1 <= channels <= 4:
        raise ValueError(f"channels={channels} (1-4)")
    wide = precision > 8
    need = width * height * channels * (2 if wide else 1)
    if len(pixels) != need:
        raise ValueError(f"need {need} bytes, got {len(pixels)}")
    img = np.frombuffer(bytes(pixels), dtype="<u2" if wide else np.uint8).reshape(
        height, width, channels
    ).astype(np.int64)
    return encode_jpeg_lossless_planes(
        [img[:, :, c] for c in range(channels)],
        [(1, 1)] * channels,
        width, height,
        predictor=predictor, precision=precision, pt=pt,
        restart_interval=restart_interval,
    )


def encode_jpeg_lossless_planes(
    planes: list,
    sampling: list,
    width: int,
    height: int,
    predictor: int = 1,
    precision: int = 8,
    pt: int = 0,
    restart_interval: int = 0,
) -> bytes:
    """General SOF3 fixture encoder over per-component PLANES with
    explicit ``sampling`` = [(h_i, v_i), ...] factors: plane i must
    have shape (ceil(height*v_i/vmax), ceil(width*h_i/hmax)).
    Interleaved MCU order identical to the decoder (component, dy,
    dx); edge MCUs pad by edge replication (padding samples are coded
    — the decoder decodes and crops them).  With ``pt`` the coded
    samples are plane >> pt.  One shared Huffman table; restart
    intervals as in ``encode_jpeg_lossless``."""
    import struct as _struct

    channels = len(planes)
    if channels != len(sampling) or not 1 <= channels <= 4:
        raise ValueError(f"{channels} planes vs {len(sampling)} sampling factors")
    if not 2 <= precision <= 16:
        raise ValueError(f"precision={precision} (2-16)")
    if not 1 <= predictor <= 7:
        raise ValueError(f"predictor={predictor} (1-7)")
    if not 0 <= pt < precision:
        raise ValueError(f"point transform pt={pt} (0..precision-1)")
    if restart_interval < 0:
        raise ValueError(f"restart_interval={restart_interval} must be >= 0")
    hmax = max(hs for hs, _vs in sampling)
    vmax = max(vs for _hs, vs in sampling)
    mcux = -(-width // hmax)
    mcuy = -(-height // vmax)
    shifted = []
    for ci, (plane, (hs, vs)) in enumerate(zip(planes, sampling)):
        a = np.asarray(plane, dtype=np.int64)
        cw = -(-width * hs // hmax)
        ch = -(-height * vs // vmax)
        if a.shape != (ch, cw):
            raise ValueError(
                f"plane {ci} shape {a.shape} != expected {(ch, cw)}"
            )
        if a.max() >= (1 << precision) or a.min() < 0:
            raise ValueError(f"plane {ci} exceeds {precision}-bit range")
        a = a >> pt
        # pad to the MCU grid by edge replication (coded, then cropped
        # by the decoder)
        py, px = mcuy * vs - ch, mcux * hs - cw
        if py or px:
            a = np.pad(a, ((0, py), (0, px)), mode="edge")
        shifted.append(a)

    default = 1 << (precision - 1 - pt)

    def category(d_mod):
        if d_mod == 32768:
            return 16, 0, 0  # special: no appended bits
        d = d_mod - 65536 if d_mod > 32768 else d_mod
        sbits = int(abs(d)).bit_length()
        if sbits == 0:
            return 0, 0, 0
        v = d if d >= 0 else d + (1 << sbits) - 1
        return sbits, v, sbits

    def pred_at(plane, y, x, fresh_flag):
        if fresh_flag or (y == 0 and x == 0):
            return default
        if y == 0:
            return int(plane[0, x - 1])
        if x == 0:
            return int(plane[y - 1, 0])
        ra, rb, rc = int(plane[y, x - 1]), int(plane[y - 1, x]), int(plane[y - 1, x - 1])
        return (
            ra if predictor == 1 else
            rb if predictor == 2 else
            rc if predictor == 3 else
            ra + rb - rc if predictor == 4 else
            ra + ((rb - rc) >> 1) if predictor == 5 else
            rb + ((ra - rc) >> 1) if predictor == 6 else
            (ra + rb) >> 1
        )

    # walk once to collect categories (Huffman table build), then
    # again to emit — same traversal both times
    def mcu_walk():
        fresh = [True] * channels
        mcu_n = 0
        for my in range(mcuy):
            for mx in range(mcux):
                if restart_interval and mcu_n and mcu_n % restart_interval == 0:
                    yield ("rst", mcu_n // restart_interval - 1, 0)
                    fresh = [True] * channels
                mcu_n += 1
                for ci in range(channels):
                    hs, vs = sampling[ci]
                    for dy in range(vs):
                        for dx in range(hs):
                            y, x = my * vs + dy, mx * hs + dx
                            d = (
                                int(shifted[ci][y, x])
                                - pred_at(shifted[ci], y, x, fresh[ci])
                            ) & 0xFFFF
                            fresh[ci] = False
                            yield ("s", ci, d)

    cats = set()
    for kind, _a, d in mcu_walk():
        if kind == "s":
            cats.add(category(d)[0])
    (bits, vals), = _build_huffman([cats])
    enc = {}
    for (length, code), sym in _canonical_codes(bits, vals).items():
        enc[sym] = (length, code)

    out = bytearray(b"\xff\xd8")

    def segment(marker, body):
        out.extend(b"\xff" + bytes([marker]) + _struct.pack(">H", len(body) + 2) + body)

    sof = bytes([precision]) + _struct.pack(">HH", height, width) + bytes([channels])
    for c in range(channels):
        hs, vs = sampling[c]
        sof += bytes([c + 1, (hs << 4) | vs, 0])
    segment(0xC3, sof)
    segment(0xC4, bytes([0x00] + bits + vals))
    if restart_interval:
        segment(0xDD, _struct.pack(">H", restart_interval))
    sos = bytes([channels])
    for c in range(channels):
        sos += bytes([c + 1, 0x00])
    sos += bytes([predictor, 0, pt])  # Ss=predictor, Se=0, Ah=0 Al=Pt
    segment(0xDA, sos)
    bw = _BitWriter()
    rst_n = 0
    for kind, a, d in mcu_walk():
        if kind == "rst":
            bw.flush()  # byte-align (1-padded per the spec)
            bw.buf.extend(bytes([0xFF, 0xD0 + (rst_n % 8)]))
            rst_n += 1
            continue
        s_cat, v, nbits = category(d)
        length, code = enc[s_cat]
        bw.write(code, length)
        if nbits:
            bw.write(v, nbits)
    bw.flush()
    out.extend(bw.buf)
    out.extend(b"\xff\xd9")
    return bytes(out)


# ---------------------------------------------------------------------------
# Hierarchical JPEG, lossless pyramid (T.81 Annex J) — round 16
# ---------------------------------------------------------------------------

def _exp_upsample(plane: "np.ndarray", eh: int, ev: int) -> "np.ndarray":
    """The EXP reference-expansion filter (T.81 J.1.1.2): doubled
    dimension gets output[2i] = input[i] and output[2i+1] =
    (input[i] + input[i+1] + 1) >> 1, with the final odd sample
    interpolating the edge against itself ((2a+1)>>1 == a)."""
    out = plane
    if eh:
        h_, w_ = out.shape
        nxt = np.concatenate([out[:, 1:], out[:, -1:]], axis=1)
        wide = np.empty((h_, 2 * w_), dtype=out.dtype)
        wide[:, 0::2] = out
        wide[:, 1::2] = (out + nxt + 1) >> 1
        out = wide
    if ev:
        h_, w_ = out.shape
        nxt = np.concatenate([out[1:, :], out[-1:, :]], axis=0)
        tall = np.empty((2 * h_, w_), dtype=out.dtype)
        tall[0::2, :] = out
        tall[1::2, :] = (out + nxt + 1) >> 1
        out = tall
    return out


def _decode_hierarchical(payload: bytes, _struct) -> dict:
    """Hierarchical JPEG (DHP, T.81 Annex J), LOSSLESS pyramid form:
    a non-differential SOF3 frame establishes the lowest-resolution
    reference, then alternating EXP expansions and DIFFERENTIAL SOF7
    frames (Ss=0 — corrections coded directly, mod-2^16 addition onto
    the upsampled reference) refine it to full resolution.  Any
    component count at full per-frame resolution (h=v=1) — grayscale
    pyramids and interleaved color alike; a frame may cover a SUBSET
    of the DHP components (matched by id), per J's frame sequencing.
    DCT hierarchical (SOF5/6 differential DCT) and subsampled pyramid
    frames stay explicit fail-fasts; arithmetic variants (SOF13-15)
    fail in the shared SOF dispatch."""
    qt: dict = {}
    huff: dict = {}
    W = H = None
    img_precision = None
    img_comp_ids: list = []
    refs: dict = {}  # component id -> reference plane
    restart = 0
    # current-frame state
    comps: list = []
    frame_w = frame_h = 0
    differential = False
    lplanes = None

    def finalize_frame():
        nonlocal comps, lplanes
        if not comps:
            return
        if lplanes is None:
            raise ValueError("hierarchical JPEG frame without a scan")
        for ci, comp in enumerate(comps):
            plane = lplanes[ci]
            cid = comp["id"]
            if differential:
                if cid not in refs:
                    raise ValueError(
                        f"differential frame for component {cid} before "
                        "any reference"
                    )
                r = refs[cid][:frame_h, :frame_w]
                if r.shape != (frame_h, frame_w):
                    raise ValueError(
                        f"differential frame {frame_w}x{frame_h} exceeds the "
                        f"reference {r.shape[1]}x{r.shape[0]} — missing EXP?"
                    )
                refs[cid] = (r + plane) & 0xFFFF
            else:
                refs[cid] = plane
        comps, lplanes = [], None

    pos = 2
    while pos + 2 <= len(payload):
        if payload[pos] != 0xFF:
            raise ValueError(f"JPEG marker expected at {pos}")
        marker = payload[pos + 1]
        if marker == 0xFF:
            pos += 1
            continue
        if marker == 0xD9:  # EOI
            break
        if marker == 0x01 or 0xD0 <= marker <= 0xD7:
            pos += 2
            continue
        if pos + 4 > len(payload):
            break
        (seglen,) = _struct.unpack(">H", payload[pos + 2:pos + 4])
        seg = payload[pos + 4:pos + 2 + seglen]
        if marker == 0xDE:  # DHP — image-level dims (SOF syntax)
            if W is not None:
                raise ValueError("hierarchical JPEG with more than one DHP")
            img_precision = seg[0]
            H = int.from_bytes(seg[1:3], "big")
            W = int.from_bytes(seg[3:5], "big")
            for c in range(seg[5]):
                img_comp_ids.append(seg[6 + c * 3])
        elif marker == 0xDF:  # EXP — expand every reference component
            finalize_frame()
            if not refs:
                raise ValueError("EXP before any reference frame")
            eh, ev = seg[0] >> 4, seg[0] & 15
            if eh not in (0, 1) or ev not in (0, 1):
                raise ValueError(f"EXP expansion {eh}/{ev} (0 or 1 defined)")
            for cid in list(refs):
                refs[cid] = _exp_upsample(refs[cid], eh, ev)
        elif marker == 0xDB:
            _parse_dqt(seg, qt)
        elif marker == 0xC4:
            _parse_dht(seg, huff)
        elif marker == 0xDD:
            restart = int.from_bytes(seg[0:2], "big")
        elif marker in (0xC3, 0xC7):  # SOF3 / SOF7 (differential) lossless
            finalize_frame()
            if W is None:
                raise ValueError("hierarchical frame before DHP")
            differential = marker == 0xC7
            if not 2 <= seg[0] <= 16 or seg[0] != img_precision:
                raise ValueError(
                    f"frame precision {seg[0]} vs DHP {img_precision}"
                )
            frame_h = int.from_bytes(seg[1:3], "big")
            frame_w = int.from_bytes(seg[3:5], "big")
            comps = []
            for c in range(seg[5]):
                cid, hv, tq = seg[6 + c * 3:9 + c * 3]
                if cid not in img_comp_ids:
                    raise ValueError(
                        f"hierarchical frame component {cid} not declared in DHP"
                    )
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 15, "tq": tq})
                if comps[-1]["h"] != 1 or comps[-1]["v"] != 1:
                    raise NotImplementedError(
                        "subsampled hierarchical frame (full-res pyramid only)"
                    )
            lplanes = None
        elif marker in (0xC0, 0xC1, 0xC2, 0xC5, 0xC6):
            raise NotImplementedError(
                f"hierarchical JPEG SOF{marker - 0xC0}: only the LOSSLESS "
                "pyramid (SOF3 + differential SOF7) decodes here — "
                "DCT-differential frames need the reference/correction "
                "rounding rules a real payload would pin; none exists in "
                "this environment"
            )
        elif marker in (0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                f"JPEG SOF{marker - 0xC0}: arithmetic coding fails fast "
                "(no independent fixture can validate the Qe table here)"
            )
        elif marker == 0xDA:  # SOS
            if not comps:
                raise ValueError("hierarchical SOS before SOF")
            if lplanes is None:
                lplanes = [
                    np.zeros((frame_h, frame_w), dtype=np.int64) for _ in comps
                ]
            ns = seg[0]
            scan = []
            for c in range(ns):
                cs, tdta = seg[1 + c * 2:3 + c * 2]
                idx = next(
                    i for i, comp in enumerate(comps) if comp["id"] == cs
                )
                scan.append((idx, tdta >> 4, tdta & 15))
            ss, se, ahal = seg[1 + 2 * ns:4 + 2 * ns]
            pos = _decode_lossless_scan(
                payload, pos + 2 + seglen, comps, huff, scan,
                ss, ahal & 15, frame_w, frame_h, restart,
                img_precision, lplanes, differential=differential,
            )
            continue
        pos += 2 + seglen
    finalize_frame()
    if not refs or W is None:
        raise ValueError("hierarchical JPEG missing DHP/frames")
    missing = [cid for cid in img_comp_ids if cid not in refs]
    if missing:
        raise ValueError(f"hierarchical components never coded: {missing}")
    for cid in img_comp_ids:
        if refs[cid].shape != (H, W):
            raise ValueError(
                f"component {cid} reconstruction "
                f"{refs[cid].shape[1]}x{refs[cid].shape[0]} != DHP dims {W}x{H}"
            )
    raw = np.stack([refs[cid] for cid in img_comp_ids], axis=2)
    shift = max(0, img_precision - 8)
    px8 = np.clip(raw >> shift if shift else raw, 0, 255).astype(np.uint8)
    return {
        "format": "jpeg", "width": W, "height": H,
        "channels": len(img_comp_ids), "pixels": px8.tobytes(),
        "raw_planes": raw, "bits": img_precision, "hierarchical": True,
    }


def encode_jpeg_hierarchical(
    width: int,
    height: int,
    pixels: bytes,
    levels: int = 2,
    precision: int = 8,
    predictor: int = 1,
    channels: int = 1,
) -> bytes:
    """Hierarchical LOSSLESS fixture encoder (T.81 Annex J): a pyramid
    of ``levels`` frames — the coarsest level (decimated by
    2^(levels-1)) as a non-differential SOF3 frame, then per level an
    EXP(1,1) expansion and a differential SOF7 frame whose corrections
    are (target - upsampled reference) mod 2^16, coded with Ss=0.
    Multi-channel images code all components interleaved in every
    frame (full resolution, h=v=1).  EXACT round-trip by construction:
    the decoder's mod-2^16 addition reproduces every target level
    bit-for-bit.  ``pixels``: interleaved uint8 for precision <= 8,
    little-endian uint16 above."""
    import struct as _struct

    if levels < 1:
        raise ValueError(f"levels={levels} must be >= 1")
    if not 1 <= channels <= 4:
        raise ValueError(f"channels={channels} (1-4)")
    wide = precision > 8
    need = width * height * channels * (2 if wide else 1)
    if len(pixels) != need:
        raise ValueError(f"need {need} bytes, got {len(pixels)}")
    img = np.frombuffer(bytes(pixels), dtype="<u2" if wide else np.uint8).reshape(
        height, width, channels
    ).astype(np.int64)
    if img.max() >= (1 << precision):
        raise ValueError(f"sample exceeds {precision}-bit range")
    pyramid = [img]
    for _ in range(levels - 1):
        pyramid.append(pyramid[-1][::2, ::2, :])
    if pyramid[-1].shape[0] < 1 or pyramid[-1].shape[1] < 1:
        raise ValueError(f"levels={levels} decimates {width}x{height} to nothing")
    pyramid.reverse()  # coarsest first

    def category(d_mod):
        if d_mod == 32768:
            return 16, 0, 0
        d = d_mod - 65536 if d_mod > 32768 else d_mod
        sbits = int(abs(d)).bit_length()
        if sbits == 0:
            return 0, 0, 0
        v = d if d >= 0 else d + (1 << sbits) - 1
        return sbits, v, sbits

    def segment(marker, body):
        return b"\xff" + bytes([marker]) + _struct.pack(">H", len(body) + 2) + body

    def frame_bytes(planes_v, fh, fw, sof_marker, ss):
        """One frame: DHT (table 0 redefined per frame) + SOF + SOS +
        entropy over per-component value planes interleaved in the
        decoder's MCU order (y, x, component) — prediction already
        applied for the non-differential frame (ss = predictor), raw
        mod-2^16 corrections for the differential one (ss = 0)."""
        stacked = np.stack(planes_v, axis=2)  # (fh, fw, ch): MCU order
        cats = {category(int(v))[0] for v in stacked.reshape(-1)}
        (bits, vals), = _build_huffman([cats])
        enc = {}
        for (length, code), sym in _canonical_codes(bits, vals).items():
            enc[sym] = (length, code)
        sof = bytes([precision]) + _struct.pack(">HH", fh, fw) + bytes([channels])
        for c in range(channels):
            sof += bytes([c + 1, 0x11, 0])
        sos = bytes([channels])
        for c in range(channels):
            sos += bytes([c + 1, 0x00])
        sos += bytes([ss, 0, 0])
        bw = _BitWriter()
        for v in stacked.reshape(-1):
            s_cat, vv, nbits = category(int(v))
            length, code = enc[s_cat]
            bw.write(code, length)
            if nbits:
                bw.write(vv, nbits)
        bw.flush()
        return (segment(0xC4, bytes([0x00] + bits + vals))
                + segment(sof_marker, sof) + segment(0xDA, sos) + bytes(bw.buf))

    def pred_diffs(plane):
        """Annex-H predictor walk (the encode_jpeg_lossless_planes
        rule) over one plane -> mod-2^16 difference grid."""
        fh, fw = plane.shape
        default = 1 << (precision - 1)
        out = np.empty((fh, fw), dtype=np.int64)
        for y in range(fh):
            for x in range(fw):
                if y == 0 and x == 0:
                    pred = default
                elif y == 0:
                    pred = plane[0, x - 1]
                elif x == 0:
                    pred = plane[y - 1, 0]
                else:
                    ra, rb, rc = plane[y, x - 1], plane[y - 1, x], plane[y - 1, x - 1]
                    pred = (
                        ra if predictor == 1 else
                        rb if predictor == 2 else
                        rc if predictor == 3 else
                        ra + rb - rc if predictor == 4 else
                        ra + ((rb - rc) >> 1) if predictor == 5 else
                        rb + ((ra - rc) >> 1) if predictor == 6 else
                        (ra + rb) >> 1
                    )
                out[y, x] = (int(plane[y, x]) - int(pred)) & 0xFFFF
        return out

    out = bytearray(b"\xff\xd8")
    dhp = bytes([precision]) + _struct.pack(">HH", height, width) + bytes([channels])
    for c in range(channels):
        dhp += bytes([c + 1, 0x11, 0])
    out += segment(0xDE, dhp)
    base = pyramid[0]
    out += frame_bytes(
        [pred_diffs(base[:, :, c]) for c in range(channels)],
        base.shape[0], base.shape[1], 0xC3, predictor,
    )
    ref = base
    for target in pyramid[1:]:
        out += segment(0xDF, bytes([0x11]))  # EXP both dimensions
        up = np.stack(
            [
                _exp_upsample(ref[:, :, c], 1, 1)[
                    : target.shape[0], : target.shape[1]
                ]
                for c in range(channels)
            ],
            axis=2,
        )
        corr = (target - up) & 0xFFFF
        out += frame_bytes(
            [corr[:, :, c] for c in range(channels)],
            target.shape[0], target.shape[1], 0xC7, 0,
        )
        ref = target
    out += b"\xff\xd9"
    return bytes(out)
