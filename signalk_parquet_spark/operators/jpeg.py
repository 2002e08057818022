"""Baseline JPEG (ITU-T T.81) pixel decoder — pure Python + numpy, no
codec library. Covers baseline sequential DCT (SOF0): 8-bit samples,
Huffman entropy coding, grayscale or YCbCr with any integer sampling
factors that divide the max (4:4:4, 4:2:2, 4:2:0 …), restart markers,
byte stuffing. Progressive (SOF2), arithmetic coding, 12-bit precision,
and hierarchical modes return None — callers quarantine rather than crash
(the decode_png_pixels contract).

This closes the last "needs a codec library" TODO for still images: the
DECODERS["image_pixels"] entry now scores real pixels for both PNG and
JPEG payloads. Everything here derives from the public T.81 spec (marker
layout, canonical Huffman construction, the EXTEND procedure, zigzag
scan, dequantize + 2-D inverse DCT) and the public T.871 YCbCr↔RGB
constants.

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


def decode_jpeg_pixels(payload: bytes):
    """Decode a baseline JPEG to an (H, W, C) uint8 array (C=1 grayscale,
    C=3 RGB), or None for anything outside baseline coverage."""
    import numpy as np

    if not payload.startswith(b"\xff\xd8"):
        return None
    try:
        qt: dict[int, list[int]] = {}
        huff: dict[tuple[int, int], dict] = {}
        frame = None  # (H, W, [(cid, h, v, tq), ...])
        restart_interval = 0
        scan = None  # ([(comp_idx, dc_id, ac_id), ...], segments)
        i = 2
        p = payload
        while i + 1 < len(p) and scan is None:
            if p[i] != 0xFF:
                return None
            m = p[i + 1]
            if m == 0xD9:  # EOI before any scan
                return None
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
                        return None  # 16-bit tables: not baseline
                    qt[tq] = list(body[j + 1 : j + 65])
                    j += 65
            elif m == 0xC0:  # SOF0 baseline sequential
                if body[0] != 8:
                    return None
                h_, w_ = struct.unpack(">HH", body[1:5])
                n = body[5]
                comps = []
                for k in range(n):
                    cid, hv, tq = body[6 + 3 * k : 9 + 3 * k]
                    comps.append((cid, hv >> 4, hv & 0x0F, tq))
                frame = (h_, w_, comps)
            elif m in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA,
                       0xCB, 0xCD, 0xCE, 0xCF):
                return None  # non-baseline SOF
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
            elif m == 0xDA:  # SOS
                if frame is None:
                    return None
                ns = body[0]
                sel = []
                cids = [c[0] for c in frame[2]]
                for k in range(ns):
                    cs, tda = body[1 + 2 * k : 3 + 2 * k]
                    sel.append((cids.index(cs), tda >> 4, tda & 0x0F))
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
                scan = (sel, segments)
            # skip unknown/APPn/COM
            i += 2 + seglen
        if frame is None or scan is None:
            return None

        h_, w_, comps = frame
        if h_ == 0 or w_ == 0:
            return None
        sel, segments = scan
        hmax = max(c[1] for c in comps)
        vmax = max(c[2] for c in comps)
        if any(hmax % c[1] or vmax % c[2] for c in comps):
            return None
        mcux = -(-w_ // (8 * hmax))
        mcuy = -(-h_ // (8 * vmax))
        planes = [
            np.zeros((mcuy * 8 * c[2], mcux * 8 * c[1]), dtype=np.uint8)
            for c in comps
        ]
        qtabs = []
        for c in comps:
            if c[3] not in qt:
                return None
            zq = qt[c[3]]
            qtabs.append(zq)
        pred = [0] * len(comps)
        seg_idx = 0
        br = _BitReader(bytes(segments[0]))
        for mcu in range(mcux * mcuy):
            if restart_interval and mcu and mcu % restart_interval == 0:
                seg_idx += 1
                if seg_idx >= len(segments):
                    raise ValueError("missing restart segment")
                br = _BitReader(bytes(segments[seg_idx]))
                pred = [0] * len(comps)
            my, mx = divmod(mcu, mcux)
            for ci, dc_id, ac_id in sel:
                _, ch, cv, _tq = comps[ci]
                dct = huff.get((0, dc_id))
                act = huff.get((1, ac_id))
                if dct is None or act is None:
                    return None
                for by in range(cv):
                    for bx in range(ch):
                        coef = np.zeros((8, 8), dtype=np.float64)
                        s = br.read_symbol(dct)
                        diff = _extend(br.receive(s), s) if s else 0
                        pred[ci] += diff
                        coef[0, 0] = pred[ci] * qtabs[ci][0]
                        k = 1
                        while k < 64:
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
                            rr, cc = ZIGZAG[k]
                            coef[rr, cc] = _extend(br.receive(s), s) * qtabs[ci][k]
                            k += 1
                        px = idct_block(coef)
                        y0 = (my * cv + by) * 8
                        x0 = (mx * ch + bx) * 8
                        planes[ci][y0 : y0 + 8, x0 : x0 + 8] = px
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
