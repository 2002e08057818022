"""JPEG (ITU-T T.81) pixel decoder — pure Python + numpy, no codec
library. Covers baseline sequential DCT (SOF0, 8-bit Huffman) AND
progressive DCT (SOF2: spectral selection + successive approximation,
DC/AC first and refinement scans, EOB runs), grayscale or YCbCr with any
integer sampling factors that divide the max (4:4:4, 4:2:2, 4:2:0 …),
restart markers, byte stuffing. Arithmetic coding, 12-bit precision,
lossless, and hierarchical modes return None — callers quarantine rather
than crash (the decode_png_pixels contract).

This closes the still-image "needs a codec library" TODO: the
DECODERS["image_pixels"] entry scores real pixels for PNG and for both
JPEG modes found in the wild. Everything here derives from the public
T.81 spec (marker layout, canonical Huffman construction, the EXTEND
procedure, zigzag scan, progressive approximation per Annex G) and the
public T.871 YCbCr↔RGB constants; cross-validated against Java ImageIO
on real camera files (tests/test_jpeg.py).

Architecture: scans accumulate QUANTIZED coefficients into per-component
block grids (progressive requires it; baseline is the one-scan special
case), then a single dequantize + IDCT + upsample + color-convert pass
renders pixels.

Scale note: entropy decoding is inherently sequential per scan, so this
pure-Python path is for thumbnails/previews inside the Arrow-batched
multimodal operators; a codec library slots into DECODERS the same way
for production-size images.
"""

from __future__ import annotations

import math
import struct


def _zigzag():
    # standard zigzag scan: position k in the scan -> (row, col) in the block
    order = sorted(
        ((r, c) for r in range(8) for c in range(8)),
        key=lambda rc: (rc[0] + rc[1], rc[0] if (rc[0] + rc[1]) % 2 else rc[1]),
    )
    return order


ZIGZAG = _zigzag()


#: orthonormal 8-point DCT-II matrix; F = M @ f @ M.T, f = M.T @ F @ M
def _dct_matrix():
    import numpy as np

    m = np.zeros((8, 8), dtype=np.float64)
    for u in range(8):
        cu = math.sqrt(1.0 / 8.0) if u == 0 else math.sqrt(2.0 / 8.0)
        for x in range(8):
            m[u, x] = cu * math.cos((2 * x + 1) * u * math.pi / 16.0)
    return m


def idct_block(coef):
    """2-D inverse DCT of an 8x8 coefficient block (float64), level-shifted
    (+128) and rounded floor(x+0.5) into [0, 255] — the exact arithmetic
    the round-trip tests reproduce."""
    import numpy as np

    m = _dct_matrix()
    spatial = m.T @ coef @ m + 128.0
    return np.clip(np.floor(spatial + 0.5), 0, 255).astype(np.uint8)


def ycbcr_to_rgb(y, cb, cr):
    """T.871 full-range YCbCr -> RGB (float in, uint8 out, floor(x+0.5))."""
    import numpy as np

    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    out = np.stack([r, g, b], axis=-1)
    return np.clip(np.floor(out + 0.5), 0, 255).astype("uint8")


def _build_huffman(counts, symbols):
    """Canonical Huffman per T.81 C.2: {(bit_length, code): symbol}."""
    table = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(counts[length - 1]):
            table[(length, code)] = symbols[k]
            k += 1
            code += 1
        code <<= 1
    return table


# --- T.81 Annex K "typical" Huffman tables (Tables K.3-K.6) -------------------
# The MJPEG convention (OpenDML AVI, RTP/JPEG RFC 2435): frames may omit DHT
# entirely and decoders supply these spec-published defaults. Keys are
# (class, id): class 0=DC 1=AC, id 0=luminance 1=chrominance. Exposed for the
# tests, which pin the canonical-code spot values the spec publishes (luma AC
# EOB = 1010 at 4 bits, chroma AC EOB = 00 at 2 bits, ...).
ANNEX_K_HUFF = {
    (0, 0): ([0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0], list(range(12))),
    (0, 1): ([0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0], list(range(12))),
    (1, 0): (
        [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 125],
        [
            0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
            0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
            0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
            0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
            0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
            0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
            0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
            0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
            0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
            0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
            0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
            0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
            0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
            0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7,
            0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
            0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
            0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4,
            0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
            0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA,
            0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
            0xF9, 0xFA,
        ],
    ),
    (1, 1): (
        [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 119],
        [
            0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21,
            0x31, 0x06, 0x12, 0x41, 0x51, 0x07, 0x61, 0x71,
            0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
            0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0,
            0x15, 0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34,
            0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
            0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38,
            0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48,
            0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
            0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68,
            0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
            0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
            0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96,
            0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
            0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
            0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3,
            0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2,
            0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
            0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9,
            0xEA, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
            0xF9, 0xFA,
        ],
    ),
}

_K_BUILT: dict = {}


def _default_huffman(key):
    """Built (and cached) Annex K table for a (class, id) key, or None."""
    if key not in _K_BUILT and key in ANNEX_K_HUFF:
        _K_BUILT[key] = _build_huffman(*ANNEX_K_HUFF[key])
    return _K_BUILT.get(key)


class _BitReader:
    __slots__ = ("d", "pos", "bit")

    def __init__(self, data: bytes):
        self.d = data
        self.pos = 0
        self.bit = 0

    def read_bit(self) -> int:
        if self.pos >= len(self.d):
            raise ValueError("entropy data exhausted")
        b = (self.d[self.pos] >> (7 - self.bit)) & 1
        self.bit += 1
        if self.bit == 8:
            self.bit = 0
            self.pos += 1
        return b

    def receive(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def read_symbol(self, table) -> int:
        code = 0
        for length in range(1, 17):
            code = (code << 1) | self.read_bit()
            sym = table.get((length, code))
            if sym is not None:
                return sym
        raise ValueError("invalid Huffman code")


def _extend(v: int, s: int) -> int:
    # T.81 F.12: map the s received bits to the signed coefficient value
    if s and v < (1 << (s - 1)):
        return v - (1 << s) + 1
    return v


class _Scan:
    """One SOS: component selection, band, approximation, entropy segments.

    ``tables`` snapshots the Huffman dict AS OF this scan's position in the
    stream — progressive files routinely redefine DHT ids between scans, so
    decoding later with the final table state mis-decodes earlier scans."""

    __slots__ = ("sel", "ss", "se", "ah", "al", "segments", "tables")

    def __init__(self, sel, ss, se, ah, al, segments, tables):
        self.sel = sel  # [(comp_idx, dc_table_id, ac_table_id)]
        self.ss = ss
        self.se = se
        self.ah = ah
        self.al = al
        self.segments = segments
        self.tables = tables


def _decode_scan(scan, comps, coefs, huff, restart_interval, mcux, mcuy):
    """Decode one scan's entropy data into the quantized-coefficient grids.

    Interleaved (ns > 1): MCU order over the frame grid. Non-interleaved
    (ns == 1): the component's own block grid (T.81 A.2.2). Handles DC
    first/refine, AC first/refine with EOB runs, restart intervals."""
    sel = scan.sel
    interleaved = len(sel) > 1
    pred = {ci: 0 for ci, _, _ in sel}
    eobrun = 0
    seg_idx = 0
    br = _BitReader(bytes(scan.segments[0]))

    def restart():
        nonlocal br, seg_idx, eobrun
        seg_idx += 1
        if seg_idx >= len(scan.segments):
            raise ValueError("missing restart segment")
        br = _BitReader(bytes(scan.segments[seg_idx]))
        for k in pred:
            pred[k] = 0
        eobrun = 0

    def dc_first(ci, dct, blk):
        s = br.read_symbol(dct)
        diff = _extend(br.receive(s), s) if s else 0
        pred[ci] += diff
        blk[0] = pred[ci] << scan.al

    def dc_refine(blk):
        if br.read_bit():
            blk[0] |= 1 << scan.al

    def ac_first(act, blk):
        nonlocal eobrun
        if eobrun:
            eobrun -= 1
            return
        k = scan.ss
        while k <= scan.se:
            rs = br.read_symbol(act)
            r, s = rs >> 4, rs & 0x0F
            if s == 0:
                if r < 15:
                    eobrun = (1 << r) - 1
                    if r:
                        eobrun += br.receive(r)
                    return
                k += 16  # ZRL
                continue
            k += r
            if k > scan.se:
                raise ValueError("AC index overflow")
            blk[k] = _extend(br.receive(s), s) << scan.al
            k += 1

    def ac_refine(act, blk):
        nonlocal eobrun
        p1 = 1 << scan.al
        m1 = -1 << scan.al
        k = scan.ss
        if not eobrun:
            while k <= scan.se:
                rs = br.read_symbol(act)
                r, s = rs >> 4, rs & 0x0F
                if s == 0:
                    if r < 15:
                        eobrun = 1 << r
                        if r:
                            eobrun += br.receive(r)
                        break
                    # ZRL: skip 16 zero-history positions (with corrections)
                    val = 0
                else:
                    if s != 1:
                        raise ValueError("AC refinement size != 1")
                    val = p1 if br.read_bit() else m1
                # advance past r zero-history coefficients, correcting
                # nonzero-history ones on the way (T.81 G.1.2.3)
                while k <= scan.se:
                    if blk[k]:
                        if br.read_bit() and not (blk[k] & p1):
                            blk[k] += p1 if blk[k] > 0 else m1
                    else:
                        if r == 0:
                            if val:
                                blk[k] = val
                            k += 1
                            break
                        r -= 1
                    k += 1
        if eobrun:
            while k <= scan.se:
                if blk[k]:
                    if br.read_bit() and not (blk[k] & p1):
                        blk[k] += p1 if blk[k] > 0 else m1
                k += 1
            eobrun -= 1

    def baseline_ac(act, blk):
        # plain sequential AC, k = 1..63, no approximation, plain EOB
        k = 1
        while k <= 63:
            rs = br.read_symbol(act)
            r, s = rs >> 4, rs & 0x0F
            if s == 0:
                if r == 15:
                    k += 16
                    continue
                break  # EOB
            k += r
            if k > 63:
                raise ValueError("AC index overflow")
            blk[k] = _extend(br.receive(s), s)
            k += 1

    def decode_block(ci, dc_id, ac_id, by, bx):
        blk = coefs[ci][by][bx]
        if scan.ss == 0:
            if scan.ah == 0:
                dct = huff.get((0, dc_id))
                if dct is None:
                    raise ValueError("missing DC table")
                dc_first(ci, dct, blk)
            else:
                dc_refine(blk)
            if scan.se == 0:
                return  # progressive DC-only scan
            act = huff.get((1, ac_id))
            if act is None:
                raise ValueError("missing AC table")
            baseline_ac(act, blk)  # sequential full-band scan
            return
        act = huff.get((1, ac_id))
        if act is None:
            raise ValueError("missing AC table")
        if scan.ah == 0:
            ac_first(act, blk)
        else:
            ac_refine(act, blk)

    if interleaved:
        nmcu = mcux * mcuy
        for mcu in range(nmcu):
            if restart_interval and mcu and mcu % restart_interval == 0:
                restart()
            my, mx = divmod(mcu, mcux)
            for ci, dc_id, ac_id in sel:
                _, ch, cv, _ = comps[ci]
                for by in range(cv):
                    for bx in range(ch):
                        decode_block(ci, dc_id, ac_id, my * cv + by, mx * ch + bx)
    else:
        ci, dc_id, ac_id = sel[0]
        _, ch, cv, _ = comps[ci]
        bw = len(coefs[ci][0])
        bh = len(coefs[ci])
        # non-interleaved: the component's own block grid (no MCU padding
        # beyond its ceil dims)
        nb = 0
        for by in range(bh):
            for bx in range(bw):
                if restart_interval and nb and nb % restart_interval == 0:
                    restart()
                decode_block(ci, dc_id, ac_id, by, bx)
                nb += 1


def decode_jpeg_pixels(payload: bytes):
    """Decode a baseline or progressive JPEG to an (H, W, C) uint8 array
    (C=1 grayscale, C=3 RGB), or None for anything outside coverage."""
    import numpy as np

    if not payload.startswith(b"\xff\xd8"):
        return None
    try:
        qt: dict[int, list[int]] = {}
        huff: dict[tuple[int, int], dict] = {}
        frame = None  # (H, W, [(cid, h, v, tq), ...], progressive)
        restart_interval = 0
        scans: list[_Scan] = []
        i = 2
        p = payload
        while i + 1 < len(p):
            if p[i] != 0xFF:
                return None
            m = p[i + 1]
            if m == 0xD9:  # EOI
                break
            if m in (0x01,) or 0xD0 <= m <= 0xD7:
                i += 2
                continue
            (seglen,) = struct.unpack(">H", p[i + 2 : i + 4])
            body = p[i + 4 : i + 2 + seglen]
            if m == 0xDB:  # DQT
                j = 0
                while j < len(body):
                    pq, tq = body[j] >> 4, body[j] & 0x0F
                    if pq != 0:
                        return None  # 16-bit tables
                    qt[tq] = list(body[j + 1 : j + 65])
                    j += 65
            elif m in (0xC0, 0xC1, 0xC2):  # baseline / ext. sequential / progressive
                if body[0] != 8:
                    return None
                h_, w_ = struct.unpack(">HH", body[1:5])
                n = body[5]
                comps = []
                for k in range(n):
                    cid, hv, tq = body[6 + 3 * k : 9 + 3 * k]
                    comps.append((cid, hv >> 4, hv & 0x0F, tq))
                frame = (h_, w_, comps, m == 0xC2)
            elif m in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
                return None  # lossless / arithmetic / hierarchical
            elif m == 0xC4:  # DHT
                j = 0
                while j < len(body):
                    tc, th = body[j] >> 4, body[j] & 0x0F
                    counts = list(body[j + 1 : j + 17])
                    nsym = sum(counts)
                    symbols = list(body[j + 17 : j + 17 + nsym])
                    huff[(tc, th)] = _build_huffman(counts, symbols)
                    j += 17 + nsym
            elif m == 0xDD:  # DRI
                (restart_interval,) = struct.unpack(">H", body[:2])
            elif m == 0xDA:  # SOS — one of possibly many scans
                if frame is None:
                    return None
                ns = body[0]
                sel = []
                cids = [c[0] for c in frame[2]]
                for k in range(ns):
                    cs, tda = body[1 + 2 * k : 3 + 2 * k]
                    sel.append((cids.index(cs), tda >> 4, tda & 0x0F))
                ss, se, ahal = body[1 + 2 * ns : 4 + 2 * ns]
                # MJPEG convention: ONLY a frame that defined no DHT at
                # all uses the T.81 Annex K typical tables (OpenDML AVI /
                # RFC 2435). A file that DID define tables but is missing
                # one the scan references is corrupt — it must keep
                # failing to decode (quarantine), not silently decode its
                # entropy data under substituted tables.
                if not huff:
                    for _ci, td, ta in sel:
                        for key in ((0, td), (1, ta)):
                            if key not in huff:
                                dflt = _default_huffman(key)
                                if dflt is not None:
                                    huff[key] = dflt
                # entropy-coded data: unstuff 0xFF00, split at RSTn
                j = i + 2 + seglen
                segments: list[bytearray] = [bytearray()]
                while j < len(p):
                    b = p[j]
                    if b != 0xFF:
                        segments[-1].append(b)
                        j += 1
                        continue
                    nxt = p[j + 1] if j + 1 < len(p) else 0xD9
                    if nxt == 0x00:
                        segments[-1].append(0xFF)
                        j += 2
                    elif 0xD0 <= nxt <= 0xD7:
                        segments.append(bytearray())
                        j += 2
                    else:
                        break  # EOI or next marker
                scans.append(
                    _Scan(sel, ss, se, ahal >> 4, ahal & 0x0F, segments, dict(huff))
                )
                i = j
                continue
            i += 2 + seglen
        if frame is None or not scans:
            return None

        h_, w_, comps, _progressive = frame
        if h_ == 0 or w_ == 0:
            return None
        hmax = max(c[1] for c in comps)
        vmax = max(c[2] for c in comps)
        if any(hmax % c[1] or vmax % c[2] for c in comps):
            return None
        mcux = -(-w_ // (8 * hmax))
        mcuy = -(-h_ // (8 * vmax))
        # per-component quantized-coefficient grids (zigzag index space).
        # Interleaved scans address the full MCU-padded grid; the IDCT pass
        # renders the same grid, so sizes match either way.
        coefs = []
        for c in comps:
            bh, bw = mcuy * c[2], mcux * c[1]
            coefs.append([[[0] * 64 for _ in range(bw)] for _ in range(bh)])
        for scan in scans:
            # non-interleaved scans sweep the component's OWN ceil grid
            if len(scan.sel) == 1:
                ci = scan.sel[0][0]
                _, ch, cv, _ = comps[ci]
                # component dims: ceil(W*h/hmax) x ceil(H*v/vmax)
                cw = -(-(w_ * ch) // hmax)
                chh = -(-(h_ * cv) // vmax)
                bw_n = -(-cw // 8)
                bh_n = -(-chh // 8)
                sub = [row[:bw_n] for row in coefs[ci][:bh_n]]
                _decode_scan(
                    scan, comps, {ci: sub}, scan.tables, restart_interval, mcux, mcuy
                )
            else:
                _decode_scan(
                    scan, comps,
                    {s[0]: coefs[s[0]] for s in scan.sel},
                    scan.tables, restart_interval, mcux, mcuy,
                )
        # dequantize + IDCT + assemble planes
        planes = []
        for ci, c in enumerate(comps):
            if c[3] not in qt:
                return None
            q = qt[c[3]]
            bh, bw = mcuy * c[2], mcux * c[1]
            plane = np.zeros((bh * 8, bw * 8), dtype=np.uint8)
            for by in range(bh):
                for bx in range(bw):
                    zz = coefs[ci][by][bx]
                    coef = np.zeros((8, 8), dtype=np.float64)
                    for k in range(64):
                        if zz[k]:
                            r, cc = ZIGZAG[k]
                            coef[r, cc] = zz[k] * q[k]
                    plane[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] = idct_block(coef)
            planes.append(plane)
        # upsample subsampled planes to full grid, crop, color-convert
        full = []
        for ci, c in enumerate(comps):
            pl = planes[ci].repeat(vmax // c[2], axis=0).repeat(hmax // c[1], axis=1)
            full.append(pl[:h_, :w_].astype(np.float64))
        if len(comps) == 1:
            return full[0].astype(np.uint8)[:, :, None]
        if len(comps) == 3:
            return ycbcr_to_rgb(full[0], full[1], full[2])
        return None
    except (struct.error, IndexError, ValueError):
        return None
