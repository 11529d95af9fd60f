"""Minimal pure-Python JPEG 2000 codestream codec for GRIB2 template 5.40.

ECMWF open data and many NCEP products ship GRIB2 fields with
JPEG 2000 packing (data-representation template 5.40): section 7 is a
raw JPEG 2000 *codestream* (SOC..EOC, no JP2 container) encoding the
scaled integer field X in ``value = (R + X·2^E) / 10^D`` as a single
grayscale component. The reference reads such files through cfgrib's
eccodes/openjpeg binding (/root/reference/crawler/ecmwf.py:135-141);
this module removes that native dependency for the profile those
encoders actually emit:

- single component; single- OR multi-tile grids anchored at the
  origin (one or more SOT tile-parts per tile, tpsot-ordered),
- reversible 5/3 wavelet (lossless — GRIB2 octet 22 compression
  type 0) with no quantization, OR the irreversible 9/7 wavelet
  (lossy — octet 22 type 1) with Annex-E scalar quantization in
  either the derived or the expounded QCD form (midpoint
  reconstruction, r = 0.5),
- any number of quality layers (per-code-block pass sequences split
  across packets; incremental tag-tree inclusion), LRCP/RLCP
  progression, default precincts (one per resolution), no SOP/EPH
  markers,
- default code-block style (no bypass / reset / termall /
  vertical-causal / segmentation symbols).

Anything outside that profile raises ValueError — the ``decoder=``
injection seam of sources.grib stays available for exotic streams
(POC progression changes, per-component COC/QCC overrides, precincts,
SOP/EPH, subsampling, multi-component).

Format knowledge is the public ISO/IEC 15444-1 specification
(ITU-T T.800): Annex A markers, Annex B codestream/packet-header
syntax with tag trees, Annex C the MQ arithmetic coder (shared with
JBIG2), Annex D the EBCOT T1 coefficient coder, Annex F the
reversible 5/3 lifting transform. ``encode_j2k`` is a spec-faithful
test encoder (same subset) so round-trip and fuzz suites verify the
decoder against the format, not against itself.

Scale note: T1 bit-plane coding is inherently sequential per
code-block, and this pure-Python implementation favours clarity —
fixture-sized grids decode in milliseconds, but operational ~700k
point ECMWF fields belong on the injected-cfgrib path (or a future
vectorized T1) if they are on the hot path; the distributed read
keeps per-file decode inside one Arrow batch either way.
"""

from __future__ import annotations

import math
import struct

import numpy as np

from open_energy_data_server_spark.sources._robust import corrupt_guard

# ---------------------------------------------------------------------------
# MQ arithmetic coder (ISO 15444-1 Annex C; state table shared with JBIG2)

_QE = (
    0x5601, 0x3401, 0x1801, 0x0AC1, 0x0521, 0x0221, 0x5601, 0x5401,
    0x4801, 0x3801, 0x3001, 0x2401, 0x1C01, 0x1601, 0x5601, 0x5401,
    0x5101, 0x4801, 0x3801, 0x3401, 0x3001, 0x2801, 0x2401, 0x2201,
    0x1C01, 0x1801, 0x1601, 0x1401, 0x1201, 0x1101, 0x0AC1, 0x09C1,
    0x08A1, 0x0521, 0x0441, 0x02A1, 0x0221, 0x0141, 0x0111, 0x0085,
    0x0049, 0x0025, 0x0015, 0x0009, 0x0005, 0x0001, 0x5601,
)
_NMPS = (
    1, 2, 3, 4, 5, 38, 7, 8, 9, 10, 11, 12, 13, 29, 15, 16, 17, 18,
    19, 20, 21, 22, 23, 24, 25, 26, 27, 28, 29, 30, 31, 32, 33, 34,
    35, 36, 37, 38, 39, 40, 41, 42, 43, 44, 45, 45, 46,
)
_NLPS = (
    1, 6, 9, 12, 29, 33, 6, 14, 14, 14, 17, 18, 20, 21, 14, 14, 15,
    16, 17, 18, 19, 19, 20, 21, 22, 23, 24, 25, 26, 27, 28, 29, 30,
    31, 32, 33, 34, 35, 36, 37, 38, 39, 40, 41, 42, 43, 46,
)
_SWITCH = (
    1, 0, 0, 0, 0, 0, 1, 0, 0, 0, 0, 0, 0, 0, 1, 0, 0, 0, 0, 0, 0,
    0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0,
    0, 0, 0, 0, 0,
)

# T1 context numbering: 0-8 zero coding, 9-13 sign coding,
# 14-16 magnitude refinement, 17 run-length (cleanup aggregation),
# 18 UNIFORM. Initial (state, MPS) per Annex D: all (0,0) except
# ZC all-zero context 0 → state 4, RL → state 3, UNIFORM → state 46.
_N_CTX = 19
_CTX_RL = 17
_CTX_UNI = 18


def _fresh_contexts() -> tuple[list[int], list[int]]:
    state = [0] * _N_CTX
    state[0] = 4
    state[_CTX_RL] = 3
    state[_CTX_UNI] = 46
    return state, [0] * _N_CTX


class _MQDecoder:
    """Annex C.3 software-conventions decoder. Reading past the end of
    the segment feeds 0xFF (the marker-found branch), so truncated
    streams decode garbage bits instead of crashing — the caller's
    pass budget bounds the work and consistency checks reject the
    result."""

    __slots__ = ("data", "bp", "cur", "c", "a", "ct", "I", "mps")

    def __init__(self, data: bytes):
        self.data = data
        self.bp = 0
        self.cur = data[0] if data else 0xFF
        self.c = self.cur << 16
        self.I, self.mps = _fresh_contexts()
        self.ct = 0
        self._bytein()
        self.c = (self.c << 7) & 0xFFFFFFFF
        self.ct -= 7
        self.a = 0x8000

    def _bytein(self) -> None:
        data = self.data
        if self.cur == 0xFF:
            nxt = data[self.bp + 1] if self.bp + 1 < len(data) else 0xFF
            if nxt > 0x8F:
                self.c += 0xFF00
                self.ct = 8
            else:
                self.bp += 1
                self.cur = nxt
                self.c += nxt << 9
                self.ct = 7
        else:
            self.bp += 1
            nxt = data[self.bp] if self.bp < len(data) else 0xFF
            self.cur = nxt
            self.c += nxt << 8
            self.ct = 8

    def decode(self, k: int) -> int:
        i = self.I[k]
        qe = _QE[i]
        self.a -= qe
        if ((self.c >> 16) & 0xFFFF) < qe:
            if self.a < qe:  # MPS exchange
                self.a = qe
                d = self.mps[k]
                self.I[k] = _NMPS[i]
            else:
                self.a = qe
                d = 1 - self.mps[k]
                if _SWITCH[i]:
                    self.mps[k] ^= 1
                self.I[k] = _NLPS[i]
        else:
            self.c -= qe << 16
            if self.a & 0x8000:
                return self.mps[k]
            if self.a < qe:
                d = 1 - self.mps[k]
                if _SWITCH[i]:
                    self.mps[k] ^= 1
                self.I[k] = _NLPS[i]
            else:
                d = self.mps[k]
                self.I[k] = _NMPS[i]
        # renormalize
        while True:
            if self.ct == 0:
                self._bytein()
            self.a = (self.a << 1) & 0xFFFF
            self.c = (self.c << 1) & 0xFFFFFFFF
            self.ct -= 1
            if self.a & 0x8000:
                break
        return d


class _MQEncoder:
    """Annex C.2 encoder (tests only). The byte before the stream is a
    sentinel the first BYTEOUT writes into; it is asserted untouched
    by a carry and dropped at flush."""

    __slots__ = ("buf", "c", "a", "ct", "I", "mps")

    def __init__(self):
        self.buf = bytearray([0])  # sentinel
        self.c = 0
        self.a = 0x8000
        self.ct = 12
        self.I, self.mps = _fresh_contexts()

    def _byteout(self) -> None:
        buf = self.buf
        if buf[-1] == 0xFF:
            buf.append((self.c >> 20) & 0xFF)
            self.c &= 0xFFFFF
            self.ct = 7
        elif self.c < 0x8000000:
            buf.append((self.c >> 19) & 0xFF)
            self.c &= 0x7FFFF
            self.ct = 8
        else:
            buf[-1] += 1  # carry
            if buf[-1] == 0xFF:
                self.c &= 0x7FFFFFF
                buf.append((self.c >> 20) & 0xFF)
                self.c &= 0xFFFFF
                self.ct = 7
            else:
                buf.append((self.c >> 19) & 0xFF)
                self.c &= 0x7FFFF
                self.ct = 8

    def _renorm(self) -> None:
        while True:
            self.a = (self.a << 1) & 0xFFFF
            self.c = (self.c << 1) & 0xFFFFFFFF
            self.ct -= 1
            if self.ct == 0:
                self._byteout()
            if self.a & 0x8000:
                break

    def encode(self, bit: int, k: int) -> None:
        i = self.I[k]
        qe = _QE[i]
        if bit == self.mps[k]:
            self.a -= qe
            if self.a & 0x8000:
                self.c += qe
                return
            if self.a < qe:
                self.a = qe
            else:
                self.c += qe
            self.I[k] = _NMPS[i]
            self._renorm()
        else:
            self.a -= qe
            if self.a < qe:
                self.c += qe
            else:
                self.a = qe
            if _SWITCH[i]:
                self.mps[k] ^= 1
            self.I[k] = _NLPS[i]
            self._renorm()

    def flush(self) -> bytes:
        # SETBITS then two byteouts (Annex C.2.9)
        tempc = self.c + self.a
        self.c |= 0xFFFF
        if self.c >= tempc:
            self.c -= 0x8000
        self.c = (self.c << self.ct) & 0xFFFFFFFF
        self._byteout()
        self.c = (self.c << self.ct) & 0xFFFFFFFF
        self._byteout()
        if self.buf[0] != 0:
            raise ValueError("MQ encoder carry reached the sentinel byte")
        out = bytes(self.buf[1:])
        while out.endswith(b"\xff"):
            out = out[:-1]  # terminating 0xFF may be discarded (C.2.9)
        return out


# ---------------------------------------------------------------------------
# Packet-header bit I/O (Annex B.10.1: bit stuffing after 0xFF bytes)


class _HeaderBitReader:
    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.cur = 0
        self.ct = 0

    def bit(self) -> int:
        if self.ct == 0:
            if self.pos >= len(self.data):
                raise ValueError("JPEG2000 packet header truncated")
            prev = self.cur
            self.cur = self.data[self.pos]
            self.pos += 1
            self.ct = 7 if prev == 0xFF else 8
            if prev == 0xFF and self.cur & 0x80:
                raise ValueError("JPEG2000 packet header bit-stuffing violated")
        self.ct -= 1
        return (self.cur >> self.ct) & 1

    def bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.bit()
        return v

    def align(self) -> int:
        """End of packet header → first body byte offset."""
        self.ct = 0
        if self.cur == 0xFF:  # header may not end with 0xFF: stuff byte
            if self.pos >= len(self.data):
                raise ValueError("JPEG2000 packet header truncated")
            self.pos += 1
        self.cur = 0
        return self.pos


class _HeaderBitWriter:
    def __init__(self):
        self.out = bytearray()
        self.cur = 0
        self.free = 8

    def bit(self, b: int) -> None:
        if self.free == 0:
            self.out.append(self.cur)
            self.free = 7 if self.cur == 0xFF else 8
            self.cur = 0
        self.free -= 1
        self.cur |= (b & 1) << self.free
        # note: when free started at 7 the MSB stays 0 (stuffed)

    def bits(self, v: int, n: int) -> None:
        for i in range(n - 1, -1, -1):
            self.bit((v >> i) & 1)

    def tobytes(self) -> bytes:
        out = bytes(self.out) + bytes([self.cur]) if self.free < 8 else bytes(self.out)
        if out.endswith(b"\xff"):
            out += b"\x00"  # header must not end with 0xFF
        return out


# ---------------------------------------------------------------------------
# Tag trees (Annex B.10.2)


class _TagTree:
    def __init__(self, w: int, h: int):
        self.levels: list[tuple[int, int]] = []
        lw, lh = w, h
        while True:
            self.levels.append((lw, lh))
            if lw == 1 and lh == 1:
                break
            lw, lh = (lw + 1) // 2, (lh + 1) // 2
        self.low = [np.zeros((lh_, lw_), np.int32) for lw_, lh_ in self.levels]
        self.known = [np.zeros((lh_, lw_), bool) for lw_, lh_ in self.levels]
        self.value = [np.zeros((lh_, lw_), np.int32) for lw_, lh_ in self.levels]

    def _path(self, x: int, y: int):
        """Root→leaf node coordinates."""
        path = []
        for lvl in range(len(self.levels)):
            path.append((lvl, x >> lvl, y >> lvl))
        return reversed(path)

    def decode(self, x: int, y: int, threshold: int, rd: _HeaderBitReader) -> bool:
        """True iff leaf value < threshold (then fully resolved)."""
        low = 0
        for lvl, nx, ny in self._path(x, y):
            if self.low[lvl][ny, nx] < low:
                self.low[lvl][ny, nx] = low
            while not self.known[lvl][ny, nx] and self.low[lvl][ny, nx] < threshold:
                if rd.bit():
                    self.known[lvl][ny, nx] = True
                else:
                    self.low[lvl][ny, nx] += 1
            if not self.known[lvl][ny, nx]:
                return False
            low = self.low[lvl][ny, nx]
        return True

    # encoder side -----------------------------------------------------
    def set_values(self, leaf_values: np.ndarray) -> None:
        self.value[0][:, :] = leaf_values
        for lvl in range(1, len(self.levels)):
            lw, lh = self.levels[lvl]
            below = self.value[lvl - 1]
            for ny in range(lh):
                for nx in range(lw):
                    blk = below[2 * ny : 2 * ny + 2, 2 * nx : 2 * nx + 2]
                    self.value[lvl][ny, nx] = blk.min()

    def encode(self, x: int, y: int, threshold: int, wr: _HeaderBitWriter) -> None:
        low = 0
        for lvl, nx, ny in self._path(x, y):
            if self.low[lvl][ny, nx] < low:
                self.low[lvl][ny, nx] = low
            while self.low[lvl][ny, nx] < threshold:
                if self.low[lvl][ny, nx] >= self.value[lvl][ny, nx]:
                    if not self.known[lvl][ny, nx]:
                        wr.bit(1)
                        self.known[lvl][ny, nx] = True
                    break
                wr.bit(0)
                self.low[lvl][ny, nx] += 1
            if not self.known[lvl][ny, nx]:
                return
            low = self.low[lvl][ny, nx]


# ---------------------------------------------------------------------------
# T1 EBCOT coefficient coder (Annex D)

# zero-coding context LUTs indexed [h, v, d] (counts of significant
# horizontal / vertical / diagonal neighbours)
def _build_zc_luts():
    ll = np.zeros((3, 3, 5), np.int8)
    hh = np.zeros((3, 3, 5), np.int8)
    for h in range(3):
        for v in range(3):
            for d in range(5):
                if h == 2:
                    c = 8
                elif h == 1:
                    c = 7 if v >= 1 else (6 if d >= 1 else 5)
                elif v == 2:
                    c = 4
                elif v == 1:
                    c = 3
                else:
                    c = 2 if d >= 2 else (1 if d == 1 else 0)
                ll[h, v, d] = c
                hv = h + v
                if d >= 3:
                    c2 = 8
                elif d == 2:
                    c2 = 7 if hv >= 1 else 6
                elif d == 1:
                    c2 = 5 if hv >= 2 else (4 if hv == 1 else 3)
                else:
                    c2 = 2 if hv >= 2 else (1 if hv == 1 else 0)
                hh[h, v, d] = c2
    return ll, hh


_ZC_LL, _ZC_HH = _build_zc_luts()

# sign-coding context and XOR bit indexed by (H+1, V+1)
_SC = {
    (1, 1): (13, 0), (1, 0): (12, 0), (1, -1): (11, 0),
    (0, 1): (10, 0), (0, 0): (9, 0), (0, -1): (10, 1),
    (-1, 1): (11, 1), (-1, 0): (12, 1), (-1, -1): (13, 1),
}


class _T1:
    """Shared scan/context machinery for one code-block; the `mq`
    member is an _MQDecoder or _MQEncoder and the pass loops call
    `self.op(...)` hooks defined by the subclassing closures below."""

    def __init__(self, w: int, h: int, band: str):
        self.w, self.h = w, h
        self.band = band
        # padded state planes (1-cell apron) → no bounds checks
        self.sig = np.zeros((h + 2, w + 2), np.int8)
        self.neg = np.zeros((h + 2, w + 2), np.int8)
        self.vis = np.zeros((h + 2, w + 2), np.int8)
        self.ref = np.zeros((h + 2, w + 2), np.int8)
        self.mag = np.zeros((h + 2, w + 2), np.int64)

    def _zc_ctx(self, y: int, x: int) -> int:
        s = self.sig
        hcnt = s[y, x - 1] + s[y, x + 1]
        vcnt = s[y - 1, x] + s[y + 1, x]
        dcnt = (
            s[y - 1, x - 1] + s[y - 1, x + 1] + s[y + 1, x - 1] + s[y + 1, x + 1]
        )
        if self.band == "HH":
            return int(_ZC_HH[hcnt, vcnt, dcnt])
        if self.band == "HL":  # horizontally high-pass: swap h and v
            return int(_ZC_LL[vcnt, hcnt, dcnt])
        return int(_ZC_LL[hcnt, vcnt, dcnt])

    def _has_sig_neighbour(self, y: int, x: int) -> bool:
        s = self.sig
        return bool(
            s[y, x - 1] or s[y, x + 1] or s[y - 1, x] or s[y + 1, x]
            or s[y - 1, x - 1] or s[y - 1, x + 1]
            or s[y + 1, x - 1] or s[y + 1, x + 1]
        )

    def _sc_ctx(self, y: int, x: int) -> tuple[int, int]:
        s, n = self.sig, self.neg
        hsum = (s[y, x - 1] * (1 - 2 * n[y, x - 1])) + (
            s[y, x + 1] * (1 - 2 * n[y, x + 1])
        )
        vsum = (s[y - 1, x] * (1 - 2 * n[y - 1, x])) + (
            s[y + 1, x] * (1 - 2 * n[y + 1, x])
        )
        hh = max(-1, min(1, int(hsum)))
        vv = max(-1, min(1, int(vsum)))
        return _SC[(hh, vv)]


def _t1_decode(
    data: bytes, w: int, h: int, npasses: int, numbps: int, band: str
) -> np.ndarray:
    """Decode one code-block → signed int64 coefficients (h, w)."""
    if numbps <= 0 or npasses <= 0:
        return np.zeros((h, w), np.int64)
    t1 = _T1(w, h, band)
    mq = _MQDecoder(data)
    sig, neg, vis, ref, mag = t1.sig, t1.neg, t1.vis, t1.ref, t1.mag

    def spp(plane: int) -> None:
        bit = 1 << plane
        for y0 in range(1, h + 1, 4):
            for x in range(1, w + 1):
                for y in range(y0, min(y0 + 4, h + 1)):
                    if sig[y, x] or not t1._has_sig_neighbour(y, x):
                        continue
                    vis[y, x] = 1
                    if mq.decode(t1._zc_ctx(y, x)):
                        ctx, xor = t1._sc_ctx(y, x)
                        neg[y, x] = mq.decode(ctx) ^ xor
                        sig[y, x] = 1
                        mag[y, x] = bit

    def mrp(plane: int) -> None:
        bit = 1 << plane
        for y0 in range(1, h + 1, 4):
            for x in range(1, w + 1):
                for y in range(y0, min(y0 + 4, h + 1)):
                    if not sig[y, x] or vis[y, x]:
                        continue
                    if ref[y, x]:
                        ctx = 16
                    else:
                        ctx = 15 if t1._has_sig_neighbour(y, x) else 14
                        ref[y, x] = 1
                    if mq.decode(ctx):
                        mag[y, x] |= bit

    def cln(plane: int) -> None:
        bit = 1 << plane
        for y0 in range(1, h + 1, 4):
            full = y0 + 3 <= h
            for x in range(1, w + 1):
                start = y0
                if full and all(
                    not sig[y, x] and not vis[y, x] and not t1._has_sig_neighbour(y, x)
                    for y in range(y0, y0 + 4)
                ):
                    if not mq.decode(_CTX_RL):
                        continue  # whole column stays insignificant
                    r = (mq.decode(_CTX_UNI) << 1) | mq.decode(_CTX_UNI)
                    y = y0 + r
                    ctx, xor = t1._sc_ctx(y, x)
                    neg[y, x] = mq.decode(ctx) ^ xor
                    sig[y, x] = 1
                    mag[y, x] = bit
                    start = y + 1
                for y in range(start, min(y0 + 4, h + 1)):
                    if sig[y, x] or vis[y, x]:
                        continue
                    if mq.decode(t1._zc_ctx(y, x)):
                        ctx, xor = t1._sc_ctx(y, x)
                        neg[y, x] = mq.decode(ctx) ^ xor
                        sig[y, x] = 1
                        mag[y, x] = bit
        vis[:, :] = 0

    plane = numbps - 1
    passno = 0
    kind = 2  # 0=SPP 1=MRP 2=CLN; first pass is cleanup at the MSB plane
    while passno < npasses:
        if plane < 0:
            raise ValueError("JPEG2000 code-block has more passes than bit-planes")
        (spp, mrp, cln)[kind](plane)
        passno += 1
        if kind == 2:
            plane -= 1
            kind = 0
        else:
            kind += 1
    signs = 1 - 2 * neg[1 : h + 1, 1 : w + 1].astype(np.int64)
    return signs * mag[1 : h + 1, 1 : w + 1]


def _t1_encode(coeffs: np.ndarray, band: str, numbps: int):
    """Encode one code-block; → (bytes, npasses, msb_planes_used,
    rates) or None when all coefficients are zero. All passes form one
    MQ codeword (single termination); ``rates[p]`` is a safe stream
    length through which passes 0..p decode correctly (position after
    the pass plus the MQ register's maximum pending bytes — the
    standard truncation-point estimate), so a multi-layer caller can
    slice the codeword into per-layer segments at pass boundaries."""
    h, w = coeffs.shape
    absmag = np.abs(coeffs)
    maxmag = int(absmag.max(initial=0))
    if maxmag == 0:
        return None
    used = maxmag.bit_length()
    if used > numbps:
        raise ValueError(
            f"code-block magnitude needs {used} bit-planes, band budget {numbps}"
        )
    t1 = _T1(w, h, band)
    mq = _MQEncoder()
    sig, neg, vis, ref, mag = t1.sig, t1.neg, t1.vis, t1.ref, t1.mag
    mag[1 : h + 1, 1 : w + 1] = absmag
    negin = np.zeros_like(mag)
    negin[1 : h + 1, 1 : w + 1] = (coeffs < 0).astype(np.int64)

    def spp(plane: int) -> None:
        bit = 1 << plane
        for y0 in range(1, h + 1, 4):
            for x in range(1, w + 1):
                for y in range(y0, min(y0 + 4, h + 1)):
                    if sig[y, x] or not t1._has_sig_neighbour(y, x):
                        continue
                    vis[y, x] = 1
                    b = 1 if mag[y, x] & bit else 0
                    mq.encode(b, t1._zc_ctx(y, x))
                    if b:
                        ctx, xor = t1._sc_ctx(y, x)
                        neg[y, x] = negin[y, x]
                        mq.encode(int(negin[y, x]) ^ xor, ctx)
                        sig[y, x] = 1

    def mrp(plane: int) -> None:
        bit = 1 << plane
        for y0 in range(1, h + 1, 4):
            for x in range(1, w + 1):
                for y in range(y0, min(y0 + 4, h + 1)):
                    if not sig[y, x] or vis[y, x]:
                        continue
                    if ref[y, x]:
                        ctx = 16
                    else:
                        ctx = 15 if t1._has_sig_neighbour(y, x) else 14
                        ref[y, x] = 1
                    mq.encode(1 if mag[y, x] & bit else 0, ctx)

    def cln(plane: int) -> None:
        bit = 1 << plane
        for y0 in range(1, h + 1, 4):
            full = y0 + 3 <= h
            for x in range(1, w + 1):
                start = y0
                if full and all(
                    not sig[y, x] and not vis[y, x] and not t1._has_sig_neighbour(y, x)
                    for y in range(y0, y0 + 4)
                ):
                    hits = [y for y in range(y0, y0 + 4) if mag[y, x] & bit]
                    if not hits:
                        mq.encode(0, _CTX_RL)
                        continue
                    mq.encode(1, _CTX_RL)
                    r = hits[0] - y0
                    mq.encode((r >> 1) & 1, _CTX_UNI)
                    mq.encode(r & 1, _CTX_UNI)
                    y = hits[0]
                    ctx, xor = t1._sc_ctx(y, x)
                    neg[y, x] = negin[y, x]
                    mq.encode(int(negin[y, x]) ^ xor, ctx)
                    sig[y, x] = 1
                    start = y + 1
                for y in range(start, min(y0 + 4, h + 1)):
                    if sig[y, x] or vis[y, x]:
                        continue
                    b = 1 if mag[y, x] & bit else 0
                    mq.encode(b, t1._zc_ctx(y, x))
                    if b:
                        ctx, xor = t1._sc_ctx(y, x)
                        neg[y, x] = negin[y, x]
                        mq.encode(int(negin[y, x]) ^ xor, ctx)
                        sig[y, x] = 1
        vis[:, :] = 0

    npasses = 3 * used - 2
    plane = used - 1
    kind = 2
    rates: list[int] = []
    for _ in range(npasses):
        (spp, mrp, cln)[kind](plane)
        # position after this pass + max pending register bytes (the
        # C register flushes ≤ 2 byteouts of ≤ 2 bytes each at
        # termination) — a safe prefix length for passes so far
        rates.append(len(mq.buf) - 1 + 6)
        if kind == 2:
            plane -= 1
            kind = 0
        else:
            kind += 1
    data = mq.flush()
    rates = [min(r, len(data)) for r in rates]
    rates[-1] = len(data)
    return data, npasses, used, rates


# ---------------------------------------------------------------------------
# Reversible 5/3 lifting (Annex F), interleaved layout, int64


def _inv_lift_axis(x: np.ndarray) -> np.ndarray:
    """1D_SR along the last axis (low samples at even indices)."""
    n = x.shape[-1]
    if n < 2:
        return x
    even = x[..., 0::2].astype(np.int64).copy()
    odd = x[..., 1::2].astype(np.int64).copy()
    ne, no = even.shape[-1], odd.shape[-1]
    op = np.concatenate([odd[..., :1], odd, odd[..., -1:]], axis=-1)
    even -= (op[..., :ne] + op[..., 1 : ne + 1] + 2) >> 2
    ep = np.concatenate([even, even[..., -1:]], axis=-1)
    odd += (ep[..., :no] + ep[..., 1 : no + 1]) >> 1
    out = np.empty_like(x, dtype=np.int64)
    out[..., 0::2] = even
    out[..., 1::2] = odd
    return out


def _fwd_lift_axis(x: np.ndarray) -> np.ndarray:
    """1D_SD along the last axis (tests only)."""
    n = x.shape[-1]
    if n < 2:
        return x.astype(np.int64)
    even = x[..., 0::2].astype(np.int64).copy()
    odd = x[..., 1::2].astype(np.int64).copy()
    ne, no = even.shape[-1], odd.shape[-1]
    ep = np.concatenate([even, even[..., -1:]], axis=-1)
    odd -= (ep[..., :no] + ep[..., 1 : no + 1]) >> 1
    op = np.concatenate([odd[..., :1], odd, odd[..., -1:]], axis=-1)
    even += (op[..., :ne] + op[..., 1 : ne + 1] + 2) >> 2
    out = np.empty(x.shape, dtype=np.int64)
    out[..., 0::2] = even
    out[..., 1::2] = odd
    return out


def _interleave(ll, hl, lh, hh) -> np.ndarray:
    h = ll.shape[0] + lh.shape[0]
    w = ll.shape[1] + hl.shape[1]
    a = np.zeros((h, w), np.int64)
    a[0::2, 0::2] = ll
    a[0::2, 1::2] = hl
    a[1::2, 0::2] = lh
    a[1::2, 1::2] = hh
    return a


def _idwt53(ll: np.ndarray, bands: list[tuple[np.ndarray, np.ndarray, np.ndarray]]):
    """bands: [(HL, LH, HH)] coarsest→finest; 2D_SR = interleave,
    HOR_SR, VER_SR per level."""
    for hl, lh, hh in bands:
        a = _interleave(ll, hl, lh, hh)
        a = _inv_lift_axis(a)  # rows
        a = _inv_lift_axis(a.T).T  # columns
        ll = a
    return ll


def _fdwt53(a: np.ndarray, levels: int):
    """→ (ll, [(HL, LH, HH)] coarsest→finest) (tests only)."""
    bands: list[tuple[np.ndarray, np.ndarray, np.ndarray]] = []
    cur = a.astype(np.int64)
    for _ in range(levels):
        cur = _fwd_lift_axis(cur.T).T  # columns first (mirror of inverse)
        cur = _fwd_lift_axis(cur)  # then rows
        ll = cur[0::2, 0::2]
        hl = cur[0::2, 1::2]
        lh = cur[1::2, 0::2]
        hh = cur[1::2, 1::2]
        bands.append((hl, lh, hh))
        cur = ll
    bands.reverse()
    return cur, bands


# ---------------------------------------------------------------------------
# Irreversible 9/7 lifting (Annex F.4.8), float64, same whole-sample
# symmetric extension convention as the 5/3 code above. Scaling follows
# the spec / JJ2000: analysis multiplies the low band by 1/K and the
# high band by K; synthesis undoes both then the four lifting steps in
# reverse with the same constants.

_A97 = -1.586134342059924  # α (first analysis lift, on odd)
_B97 = -0.052980118572961  # β (on even)
_G97 = 0.882911075530934  # γ (on odd)
_D97 = 0.443506852043971  # δ (on even)
_K97 = 1.230174104914001  # K (band normalization)


def _inv_lift97_axis(x: np.ndarray) -> np.ndarray:
    """1D_SR for the 9/7 filter along the last axis (low at even)."""
    n = x.shape[-1]
    if n < 2:
        return x.astype(np.float64)
    even = x[..., 0::2].astype(np.float64) * _K97
    odd = x[..., 1::2].astype(np.float64) * (1.0 / _K97)
    ne, no = even.shape[-1], odd.shape[-1]
    op = np.concatenate([odd[..., :1], odd, odd[..., -1:]], axis=-1)
    even = even - _D97 * (op[..., :ne] + op[..., 1 : ne + 1])
    ep = np.concatenate([even, even[..., -1:]], axis=-1)
    odd = odd - _G97 * (ep[..., :no] + ep[..., 1 : no + 1])
    op = np.concatenate([odd[..., :1], odd, odd[..., -1:]], axis=-1)
    even = even - _B97 * (op[..., :ne] + op[..., 1 : ne + 1])
    ep = np.concatenate([even, even[..., -1:]], axis=-1)
    odd = odd - _A97 * (ep[..., :no] + ep[..., 1 : no + 1])
    out = np.empty(x.shape, np.float64)
    out[..., 0::2] = even
    out[..., 1::2] = odd
    return out


def _fwd_lift97_axis(x: np.ndarray) -> np.ndarray:
    """1D_SD for the 9/7 filter along the last axis (tests only)."""
    n = x.shape[-1]
    if n < 2:
        return x.astype(np.float64)
    even = x[..., 0::2].astype(np.float64)
    odd = x[..., 1::2].astype(np.float64)
    ne, no = even.shape[-1], odd.shape[-1]
    ep = np.concatenate([even, even[..., -1:]], axis=-1)
    odd = odd + _A97 * (ep[..., :no] + ep[..., 1 : no + 1])
    op = np.concatenate([odd[..., :1], odd, odd[..., -1:]], axis=-1)
    even = even + _B97 * (op[..., :ne] + op[..., 1 : ne + 1])
    ep = np.concatenate([even, even[..., -1:]], axis=-1)
    odd = odd + _G97 * (ep[..., :no] + ep[..., 1 : no + 1])
    op = np.concatenate([odd[..., :1], odd, odd[..., -1:]], axis=-1)
    even = even + _D97 * (op[..., :ne] + op[..., 1 : ne + 1])
    out = np.empty(x.shape, np.float64)
    out[..., 0::2] = even * (1.0 / _K97)
    out[..., 1::2] = odd * _K97
    return out


def _interleave_f(ll, hl, lh, hh) -> np.ndarray:
    h = ll.shape[0] + lh.shape[0]
    w = ll.shape[1] + hl.shape[1]
    a = np.zeros((h, w), np.float64)
    a[0::2, 0::2] = ll
    a[0::2, 1::2] = hl
    a[1::2, 0::2] = lh
    a[1::2, 1::2] = hh
    return a


def _idwt97(ll: np.ndarray, bands: list[tuple[np.ndarray, np.ndarray, np.ndarray]]):
    """2D_SR for the irreversible transform, coarsest→finest."""
    cur = ll.astype(np.float64)
    for hl, lh, hh in bands:
        a = _interleave_f(cur, hl, lh, hh)
        a = _inv_lift97_axis(a)  # rows
        a = _inv_lift97_axis(a.T).T  # columns
        cur = a
    return cur


def _fdwt97(a: np.ndarray, levels: int):
    """→ (ll, [(HL, LH, HH)] coarsest→finest), float64 (tests only)."""
    bands: list[tuple[np.ndarray, np.ndarray, np.ndarray]] = []
    cur = a.astype(np.float64)
    for _ in range(levels):
        cur = _fwd_lift97_axis(cur.T).T
        cur = _fwd_lift97_axis(cur)
        bands.append((cur[0::2, 1::2], cur[1::2, 0::2], cur[1::2, 1::2]))
        cur = cur[0::2, 0::2]
    bands.reverse()
    return cur, bands


# ---------------------------------------------------------------------------
# Codestream structure

_SOC = 0xFF4F
_SIZ = 0xFF51
_COD = 0xFF52
_COC = 0xFF53
_QCD = 0xFF5C
_QCC = 0xFF5D
_COM = 0xFF64
_TLM = 0xFF55
_PLM = 0xFF57
_PLT = 0xFF58
_POC = 0xFF5F
_CRG = 0xFF63
_SOT = 0xFF90
_SOD = 0xFF93
_EOC = 0xFFD9

_SKIPPABLE = {_COM, _TLM, _PLM, _PLT, _CRG}
_GAIN = {"LL": 0, "HL": 1, "LH": 1, "HH": 2}


def _band_geometry(w: int, h: int, levels: int):
    """Per-resolution band dims for a tile at the origin.

    → list over r = 0..levels of (bands) where r=0 is [('LL', w, h)]
    and r>0 is [('HL', ...), ('LH', ...), ('HH', ...)].
    """
    dims = [(w, h)]
    for _ in range(levels):
        pw, ph = dims[-1]
        dims.append(((pw + 1) // 2, (ph + 1) // 2))
    # dims[d] = LL size after d decompositions
    res = [[("LL", dims[levels][0], dims[levels][1])]]
    for r in range(1, levels + 1):
        d = levels - r + 1  # decomposition level of these bands
        pw, ph = dims[d - 1]
        lw, lh = dims[d]
        hw, hh_ = pw - lw, ph - lh
        res.append([("HL", hw, lh), ("LH", lw, hh_), ("HH", hw, hh_)])
    return res


def _cb_grid(bw: int, bh: int, cbw: int, cbh: int):
    return (max(1, -(-bw // cbw)) if bw else 0, max(1, -(-bh // cbh)) if bh else 0)


class _CodeBlock:
    __slots__ = ("w", "h", "x0", "y0", "included", "numbps", "lblock",
                 "segments", "npasses")

    def __init__(self, x0: int, y0: int, w: int, h: int):
        self.x0, self.y0, self.w, self.h = x0, y0, w, h
        self.included = False
        self.numbps = 0
        self.lblock = 3
        self.segments: list[bytes] = []
        self.npasses = 0


def _read_npasses(rd: _HeaderBitReader) -> int:
    if not rd.bit():
        return 1
    if not rd.bit():
        return 2
    v = rd.bits(2)
    if v < 3:
        return 3 + v
    u = rd.bits(5)
    if u < 31:
        return 6 + u
    return 37 + rd.bits(7)


def _write_npasses(wr: _HeaderBitWriter, n: int) -> None:
    if n == 1:
        wr.bit(0)
    elif n == 2:
        wr.bits(0b10, 2)
    elif n <= 5:
        wr.bits(0b11, 2)
        wr.bits(n - 3, 2)
    elif n <= 36:
        wr.bits(0b1111, 4)
        wr.bits(n - 6, 5)
    elif n <= 164:
        wr.bits(0b111111111, 9)
        wr.bits(n - 37, 7)
    else:
        raise ValueError(f"{n} coding passes unencodable")


@corrupt_guard("JPEG2000")
def decode_j2k(raw: bytes) -> np.ndarray:
    """Decode a JPEG 2000 codestream (lossless GRIB2 profile, see
    module docstring) → int64 samples of shape (Ysiz, Xsiz)."""
    if len(raw) < 4 or struct.unpack(">H", raw[0:2])[0] != _SOC:
        raise ValueError("not a JPEG2000 codestream (missing SOC)")
    pos = 2
    width = height = None
    precision = 8
    signed = False
    levels = 0
    layers = 1
    cbw = cbh = 64
    progression = 0
    transform = None
    guard = 2
    exps: list[int] = []
    quant_pairs: list[tuple[int, int]] | None = None
    quant_derived = False
    tile_w = tile_h = None
    prec_sizes: list[tuple[int, int]] | None = None
    sop_used = eph_used = False
    poc: list[tuple[int, int, int, int]] | None = None

    while True:
        if pos + 2 > len(raw):
            raise ValueError("JPEG2000 codestream truncated before SOT")
        marker = struct.unpack(">H", raw[pos : pos + 2])[0]
        pos += 2
        if marker == _SOT:
            pos -= 2  # tile-part loop below re-reads the marker
            break
        if pos + 2 > len(raw):
            raise ValueError("JPEG2000 marker segment truncated")
        ln = struct.unpack(">H", raw[pos : pos + 2])[0]
        body = raw[pos + 2 : pos + ln]
        if len(body) != ln - 2:
            raise ValueError("JPEG2000 marker segment truncated")
        if marker == _SIZ:
            if ln < 41:
                raise ValueError("JPEG2000 SIZ too short")
            (_rsiz, xsiz, ysiz, xosiz, yosiz, xtsiz, ytsiz, xtosiz,
             ytosiz, csiz) = struct.unpack(">HIIIIIIIIH", body[:36])
            if csiz != 1:
                raise ValueError(
                    f"{csiz}-component JPEG2000 unsupported (GRIB2 packs 1)"
                )
            if xosiz or yosiz or xtosiz or ytosiz:
                raise ValueError("JPEG2000 non-zero image/tile offsets unsupported")
            if xtsiz == 0 or ytsiz == 0:
                raise ValueError("JPEG2000 zero tile size")
            tile_w, tile_h = xtsiz, ytsiz
            ssiz, xr, yr = body[36], body[37], body[38]
            if xr != 1 or yr != 1:
                raise ValueError("JPEG2000 subsampled component unsupported")
            precision = (ssiz & 0x7F) + 1
            signed = bool(ssiz & 0x80)
            if not 1 <= precision <= 31:
                raise ValueError(f"JPEG2000 precision {precision} out of range")
            width, height = xsiz, ysiz
            if width == 0 or height == 0 or width * height > 200_000_000:
                raise ValueError(f"implausible JPEG2000 size {width}x{height}")
        elif marker == _COD:
            scod = body[0]
            sop_used = bool(scod & 0x02)
            eph_used = bool(scod & 0x04)
            progression = body[1]
            if progression > 2:
                raise ValueError(
                    f"JPEG2000 progression order {progression} unsupported "
                    "(LRCP/RLCP/RPCL only — PCRL/CPRL position-interleave "
                    "across resolutions is out of the GRIB2 profile)"
                )
            layers = struct.unpack(">H", body[2:4])[0]
            if body[4] != 0:
                raise ValueError("JPEG2000 multi-component transform unsupported")
            levels = body[5]
            if levels > 32:
                raise ValueError(f"implausible decomposition levels {levels}")
            cbw = 1 << ((body[6] & 0x0F) + 2)
            cbh = 1 << ((body[7] & 0x0F) + 2)
            if body[8] != 0:
                raise ValueError(
                    "JPEG2000 code-block style (bypass/reset/termall/causal/"
                    "segmark) unsupported"
                )
            transform = body[9]
            if transform not in (0, 1):
                raise ValueError(
                    f"JPEG2000 wavelet transform {transform} unknown "
                    "(0 = 9/7 irreversible, 1 = 5/3 reversible)"
                )
            if scod & 0x01:  # user-defined precincts: one byte per res
                if len(body) < 10 + levels + 1:
                    raise ValueError("JPEG2000 COD precinct bytes truncated")
                prec_sizes = []
                for r in range(levels + 1):
                    b = body[10 + r]
                    ppx, ppy = b & 0x0F, b >> 4
                    if r > 0 and (ppx < 1 or ppy < 1):
                        raise ValueError(
                            "JPEG2000 precinct size below one sample in a "
                            "subband (PPx/PPy must be ≥ 1 for r > 0)"
                        )
                    prec_sizes.append((ppx, ppy))
        elif marker == _QCD:
            sqcd = body[0]
            guard = sqcd >> 5
            qstyle = sqcd & 0x1F
            if qstyle == 0:
                # no quantization: 8-bit entries, exponent in bits 3-7
                exps = [b >> 3 for b in body[1:]]
            elif qstyle in (1, 2):
                # scalar derived (one 16-bit ε/μ pair, Annex E Eq E-5)
                # or scalar expounded (one pair per subband): ε in the
                # top 5 bits, 11-bit mantissa μ below
                if len(body) < 3 or (len(body) - 1) % 2:
                    raise ValueError("JPEG2000 QCD truncated")
                quant_pairs = [
                    (v >> 11, v & 0x7FF)
                    for (v,) in struct.iter_unpack(">H", body[1:])
                ]
                quant_derived = qstyle == 1
                if quant_derived and len(quant_pairs) != 1:
                    raise ValueError(
                        "JPEG2000 derived QCD must carry exactly one pair"
                    )
            else:
                raise ValueError(
                    f"JPEG2000 quantization style {qstyle} unsupported"
                )
        elif marker == _POC:
            # progression order change: 7 bytes per entry at csiz ≤ 256
            # (RSpoc u8, CSpoc u8, LYEpoc u16, REpoc u8, CEpoc u8,
            # Ppoc u8) — the packet stream follows the volumes in order
            if len(body) % 7:
                raise ValueError("JPEG2000 POC length not a multiple of 7")
            poc = []
            for off in range(0, len(body), 7):
                rs, cs, lye, re_, ce, ppoc = struct.unpack(
                    ">BBHBBB", body[off : off + 7]
                )
                if cs != 0 or ce != 1:
                    raise ValueError(
                        "JPEG2000 POC component bounds beyond the "
                        "single-component GRIB2 profile"
                    )
                if ppoc > 2:
                    raise ValueError(
                        f"JPEG2000 POC progression {ppoc} unsupported "
                        "(LRCP/RLCP/RPCL only)"
                    )
                poc.append((rs, lye, re_, ppoc))
        elif marker in (_COC, _QCC):
            raise ValueError(
                f"JPEG2000 marker 0x{marker:04X} (per-component overrides) "
                "unsupported"
            )
        elif marker in _SKIPPABLE:
            pass
        else:
            raise ValueError(f"JPEG2000 unknown marker 0x{marker:04X}")
        pos += ln

    if width is None or transform is None or not (exps or quant_pairs):
        raise ValueError("JPEG2000 missing SIZ/COD/QCD before tile data")
    if transform == 1:
        if not exps:
            raise ValueError(
                "JPEG2000 reversible 5/3 stream carries scalar quantization"
            )
        if len(exps) < 3 * levels + 1:
            raise ValueError("JPEG2000 QCD exponent count mismatch")
    else:
        if not quant_pairs:
            raise ValueError(
                "JPEG2000 irreversible 9/7 stream lacks scalar quantization"
            )
        if not quant_derived and len(quant_pairs) < 3 * levels + 1:
            raise ValueError("JPEG2000 QCD step-size count mismatch")
    if layers == 0 or layers > 64:
        raise ValueError(f"implausible JPEG2000 layer count {layers}")

    # tile grid (tiles anchored at the origin; offsets rejected above)
    ntx = -(-width // tile_w)
    nty = -(-height // tile_h)
    n_tiles = ntx * nty
    if n_tiles > 65535:
        raise ValueError(f"implausible JPEG2000 tile count {n_tiles}")

    # collect tile-parts: SOT(isot, tpsot, tnsot, psot) + SOD + data,
    # possibly several per tile (concatenated in tpsot order — with
    # LRCP/RLCP and no POC the packet stream is sequential across a
    # tile's parts)
    tile_parts: dict[int, list[tuple[int, bytes]]] = {}
    while pos + 2 <= len(raw):
        marker = struct.unpack(">H", raw[pos : pos + 2])[0]
        if marker == _EOC:
            break
        if marker != _SOT:
            raise ValueError(
                f"JPEG2000 expected SOT/EOC in tile stream, got 0x{marker:04X}"
            )
        if pos + 12 > len(raw):
            raise ValueError("JPEG2000 SOT truncated")
        lsot, isot, psot, tpsot, tnsot = struct.unpack(
            ">HHIBB", raw[pos + 2 : pos + 12]
        )
        if lsot != 10:
            raise ValueError("JPEG2000 SOT length must be 10")
        if isot >= n_tiles:
            raise ValueError(
                f"JPEG2000 tile index {isot} outside the {ntx}x{nty} grid"
            )
        sot_at = pos
        hdr_end = pos + 2 + lsot
        if hdr_end + 2 > len(raw) or struct.unpack(
            ">H", raw[hdr_end : hdr_end + 2]
        )[0] != _SOD:
            raise ValueError("JPEG2000 tile-part headers unsupported")
        body_start = hdr_end + 2
        if psot == 0:  # last tile-part: runs to EOC (Annex A.4.2)
            part_end = len(raw)
            if raw[-2:] == struct.pack(">H", _EOC):
                part_end -= 2
        else:
            part_end = sot_at + psot
            if part_end > len(raw) or part_end < body_start:
                raise ValueError("JPEG2000 Psot overruns the codestream")
        tile_parts.setdefault(isot, []).append(
            (tpsot, raw[body_start:part_end])
        )
        pos = part_end
        if psot == 0:
            break
    if not tile_parts:
        raise ValueError("JPEG2000 codestream carries no tile-parts")
    for isot in range(n_tiles):
        if isot not in tile_parts:
            raise ValueError(f"JPEG2000 tile {isot} has no tile-part")

    # decode each tile independently and paste into the image grid
    out_f = np.zeros((height, width), np.float64) if transform == 0 else None
    out_i = np.zeros((height, width), np.int64) if transform == 1 else None
    for isot, parts in tile_parts.items():
        order_seen = sorted(p[0] for p in parts)
        if order_seen != list(range(len(parts))):
            raise ValueError(
                f"JPEG2000 tile {isot} tile-part indices {order_seen} "
                "not contiguous from 0"
            )
        tdata = b"".join(d for _, d in sorted(parts, key=lambda p: p[0]))
        ty, tx = divmod(isot, ntx)
        x0, y0 = tx * tile_w, ty * tile_h
        tw = min(tile_w, width - x0)
        th = min(tile_h, height - y0)
        tile = _decode_tile(
            tdata, tw, th, levels=levels, layers=layers,
            progression=progression, cbw=cbw, cbh=cbh,
            transform=transform, exps=exps, quant_pairs=quant_pairs,
            quant_derived=quant_derived, guard=guard, precision=precision,
            prec_sizes=prec_sizes, sop=sop_used, eph=eph_used, poc=poc,
        )
        if transform == 0:
            out_f[y0 : y0 + th, x0 : x0 + tw] = tile
        else:
            out_i[y0 : y0 + th, x0 : x0 + tw] = tile

    if transform == 0:
        if not signed:
            out_f = out_f + float(1 << (precision - 1))
        lo = -(1 << (precision - 1)) if signed else 0
        hi = (1 << (precision - 1)) - 1 if signed else (1 << precision) - 1
        # clip in the float domain: corrupt streams can decode huge
        # coefficients and a float→int64 overflow must not warn/crash
        return np.rint(np.clip(out_f, lo, hi)).astype(np.int64)
    if not signed:
        out_i = out_i + (1 << (precision - 1))  # undo DC level shift
    return out_i


def _res_precincts(width: int, height: int, levels: int, r: int,
                   prec_sizes) -> tuple[int, int, int, int]:
    """(PPx, PPy, npx, npy) for resolution r of a tile at the origin:
    the precinct grid tiles the RESOLUTION grid (dims ceil(size /
    2^(levels-r))) with 2^PPx × 2^PPy cells; default (no COD precinct
    bytes) is PPx = PPy = 15 → one maximal precinct."""
    ppx, ppy = (15, 15) if prec_sizes is None else prec_sizes[r]
    shift = levels - r
    res_w = (width + (1 << shift) - 1) >> shift
    res_h = (height + (1 << shift) - 1) >> shift
    npx = ((res_w + (1 << ppx) - 1) >> ppx) if res_w else 0
    npy = ((res_h + (1 << ppy) - 1) >> ppy) if res_h else 0
    return ppx, ppy, npx, npy


def _packet_order(progression: int, layers: int, levels: int,
                  n_prec_by_res: list[int], poc) -> list[tuple[int, int, int]]:
    """Packet enumeration (l, r, p) for one tile/component.

    Plain progressions: LRCP(0), RLCP(1), RPCL(2) — precinct index is
    raster over the resolution's precinct grid. With a POC marker the
    stream is the CONCATENATION of the progression volumes in marker
    order, each iterating its own progression over layers < LYEpoc and
    RSpoc ≤ r < REpoc, a packet appearing in the FIRST volume that
    covers it; the volumes must jointly cover every packet (a gap
    would desynchronize every later packet header → loud error)."""

    def volume(ppoc: int, lye: int, rs: int, re_: int):
        lye = min(lye, layers)
        re_ = min(re_, levels + 1)
        if ppoc == 0:  # LRCP
            return [
                (l, r, p)
                for l in range(lye)
                for r in range(rs, re_)
                for p in range(n_prec_by_res[r])
            ]
        if ppoc == 1:  # RLCP
            return [
                (l, r, p)
                for r in range(rs, re_)
                for l in range(lye)
                for p in range(n_prec_by_res[r])
            ]
        # RPCL
        return [
            (l, r, p)
            for r in range(rs, re_)
            for p in range(n_prec_by_res[r])
            for l in range(lye)
        ]

    total = layers * sum(n_prec_by_res)
    if not poc:
        return volume(progression, layers, 0, levels + 1)
    seen: set[tuple[int, int, int]] = set()
    out: list[tuple[int, int, int]] = []
    for rs, lye, re_, ppoc in poc:
        for t in volume(ppoc, lye, rs, re_):
            if t not in seen:
                seen.add(t)
                out.append(t)
    if len(out) != total:
        raise ValueError(
            f"JPEG2000 POC volumes cover {len(out)} of {total} packets"
        )
    return out


def _decode_tile(
    raw: bytes,
    width: int,
    height: int,
    *,
    levels: int,
    layers: int,
    progression: int,
    cbw: int,
    cbh: int,
    transform: int,
    exps: list[int],
    quant_pairs,
    quant_derived: bool,
    guard: int,
    precision: int,
    prec_sizes=None,
    sop: bool = False,
    eph: bool = False,
    poc=None,
) -> np.ndarray:
    """Decode ONE tile's packet stream (its tile-parts concatenated)
    → (height, width) samples: int64 coefficients for the reversible
    path, dequantized+synthesized float64 (pre-DC-shift) for the
    irreversible path. Tag trees / code-block state are tile-scoped
    per Annex B."""
    data_end = len(raw)
    geometry = _band_geometry(width, height, levels)
    # per-band code-block bookkeeping grouped by PRECINCT (tag trees
    # and inclusion state are per precinct-band, Annex B.10); the
    # no-COD-precincts default (PPx=PPy=15) degenerates to one
    # precinct per resolution — the pre-precinct layout, bit-identical
    resolutions = []
    n_prec_by_res: list[int] = []
    for r, bands in enumerate(geometry):
        ppx, ppy, npx, npy = _res_precincts(width, height, levels, r,
                                            prec_sizes)
        n_prec_by_res.append(npx * npy)
        s = 0 if r == 0 else 1  # band coords are half the res grid
        rbands = []
        for bi, (name, bw, bh) in enumerate(bands):
            # precincts shrink the effective code-block size
            cbw_e = min(cbw, 1 << max(ppx - s, 0))
            cbh_e = min(cbh, 1 << max(ppy - s, 0))
            precincts = []
            for pyi in range(npy):
                for pxi in range(npx):
                    px0 = min(pxi << (ppx - s), bw)
                    py0 = min(pyi << (ppy - s), bh)
                    px1 = min((pxi + 1) << (ppx - s), bw)
                    py1 = min((pyi + 1) << (ppy - s), bh)
                    pw, ph = px1 - px0, py1 - py0
                    gx, gy = _cb_grid(pw, ph, cbw_e, cbh_e)
                    cbs = [
                        [
                            _CodeBlock(
                                px0 + x * cbw_e, py0 + y * cbh_e,
                                min(cbw_e, px1 - (px0 + x * cbw_e)),
                                min(cbh_e, py1 - (py0 + y * cbh_e)),
                            )
                            for x in range(gx)
                        ]
                        for y in range(gy)
                    ]
                    precincts.append({
                        "grid": (gx, gy), "cbs": cbs,
                        "incl": _TagTree(max(gx, 1), max(gy, 1)),
                        "imsb": _TagTree(max(gx, 1), max(gy, 1)),
                    })
            exp_idx = 0 if r == 0 else 1 + 3 * (r - 1) + bi
            if transform == 1:
                eps_b, mu_b = exps[exp_idx], 0
                delta = 1.0
            elif quant_derived:
                # Annex E Eq E-5: ε_b = ε₀ − N_L + n_b with n_b the
                # band's decomposition level (LL sits at level N_L)
                n_b = levels if r == 0 else levels - r + 1
                eps_b = quant_pairs[0][0] - levels + n_b
                mu_b = quant_pairs[0][1]
            else:
                eps_b, mu_b = quant_pairs[exp_idx]
            if transform == 0:
                # Annex E Eq E-3: Δ_b = 2^(R_b−ε_b)·(1 + μ_b/2^11),
                # R_b the band's nominal dynamic range
                r_b = precision + _GAIN[name]
                delta = (2.0 ** (r_b - eps_b)) * (1.0 + mu_b / 2048.0)
            mb = guard + eps_b - 1
            if not 0 < mb <= 38:
                raise ValueError(f"implausible JPEG2000 bit-plane count {mb}")
            rbands.append({
                "name": name, "w": bw, "h": bh, "mb": mb, "delta": delta,
                "precincts": precincts,
            })
        resolutions.append(rbands)

    order = _packet_order(progression, layers, levels, n_prec_by_res, poc)
    pos_body = 0
    for _l, _r, _p in order:
        if sop:
            # SOP is OPTIONAL per packet even when signalled in COD —
            # skip it where present (FF91, Lsop=0004, 16-bit counter)
            if raw[pos_body : pos_body + 2] == b"\xff\x91":
                if pos_body + 6 > data_end:
                    raise ValueError("JPEG2000 SOP marker truncated")
                pos_body += 6
        rd = _HeaderBitReader(raw[:data_end], pos_body)
        contributors: list[tuple[_CodeBlock, int, int]] = []
        if not rd.bit():  # empty packet
            pos_body = rd.align()
            if eph:
                if raw[pos_body : pos_body + 2] != b"\xff\x92":
                    raise ValueError("JPEG2000 missing EPH after packet header")
                pos_body += 2
            continue
        for band in resolutions[_r]:
            if band["w"] == 0 or band["h"] == 0:
                continue
            pr = band["precincts"][_p]
            gx, gy = pr["grid"]
            for gyi in range(gy):
                for gxi in range(gx):
                    cb = pr["cbs"][gyi][gxi]
                    if cb.included:
                        contributes = bool(rd.bit())
                    else:
                        contributes = pr["incl"].decode(gxi, gyi, _l + 1, rd)
                    if not contributes:
                        continue
                    if not cb.included:
                        cb.included = True
                        t = 1
                        while not pr["imsb"].decode(gxi, gyi, t, rd):
                            t += 1
                            if t > band["mb"] + 1:
                                raise ValueError(
                                    "JPEG2000 zero-bit-plane tag tree "
                                    "exceeds band bit-planes"
                                )
                        zbp = int(pr["imsb"].low[0][gyi, gxi])
                        cb.numbps = band["mb"] - zbp
                        if cb.numbps < 0:
                            raise ValueError(
                                "JPEG2000 negative code-block bit-planes"
                            )
                    np_new = _read_npasses(rd)
                    while rd.bit():
                        cb.lblock += 1
                    nbits = cb.lblock + int(math.floor(math.log2(np_new)))
                    seglen = rd.bits(nbits)
                    if seglen > data_end - pos_body:
                        raise ValueError("JPEG2000 segment length overruns data")
                    contributors.append((cb, np_new, seglen))
        body_at = rd.align()
        if eph:
            if raw[body_at : body_at + 2] != b"\xff\x92":
                raise ValueError("JPEG2000 missing EPH after packet header")
            body_at += 2
        for cb, np_new, seglen in contributors:
            if body_at + seglen > data_end:
                raise ValueError("JPEG2000 packet body truncated")
            cb.segments.append(raw[body_at : body_at + seglen])
            cb.npasses += np_new
            body_at += seglen
        pos_body = body_at

    # T1 decode into band planes, then inverse DWT
    planes: list[list[np.ndarray]] = []
    for rbands in resolutions:
        rplanes = []
        for band in rbands:
            arr = np.zeros((band["h"], band["w"]), np.int64)
            for row in (
                row for pr in band["precincts"] for row in pr["cbs"]
            ):
                for cb in row:
                    if not cb.included or cb.npasses == 0:
                        continue
                    coeffs = _t1_decode(
                        b"".join(cb.segments), cb.w, cb.h, cb.npasses,
                        cb.numbps, band["name"],
                    )
                    arr[cb.y0 : cb.y0 + cb.h, cb.x0 : cb.x0 + cb.w] = coeffs
            if transform == 0:
                # Annex E dequantization with midpoint reconstruction
                # (r = 0.5): every coding pass is decoded, so the T1
                # output IS the quantizer index q = sign·⌊|x|/Δ_b⌋
                farr = arr.astype(np.float64)
                farr = np.where(
                    arr > 0, farr + 0.5, np.where(arr < 0, farr - 0.5, 0.0)
                ) * band["delta"]
                rplanes.append(farr)
            else:
                rplanes.append(arr)
        planes.append(rplanes)

    ll = planes[0][0]
    if transform == 0:
        fimg = _idwt97(ll, [tuple(p) for p in planes[1:]])
        if fimg.shape != (height, width):
            raise ValueError("JPEG2000 reconstruction shape mismatch")
        return fimg
    img = _idwt53(ll, [tuple(p) for p in planes[1:]])
    if img.shape != (height, width):
        raise ValueError("JPEG2000 reconstruction shape mismatch")
    return img


def encode_j2k(
    samples: np.ndarray,
    precision: int,
    levels: int = 2,
    cb_size: tuple[int, int] = (64, 64),
    signed: bool = False,
    irreversible: bool = False,
    quant_style: str = "expounded",
    eps_shift: int = 0,
    mantissa: int = 0,
    layers: int = 1,
    progression: str = "lrcp",
    tile_size: tuple[int, int] | None = None,
    tile_parts: int = 1,
    precincts: tuple[int, int] | list[tuple[int, int]] | None = None,
    sop: bool = False,
    eph: bool = False,
    poc: list[tuple[int, int, int, str]] | None = None,
) -> bytes:
    """Encode (h, w) integers as a JPEG 2000 codestream in the
    decoder's profile (tests only — no rate control; every coding
    pass ships, split across ``layers`` quality layers at pass
    boundaries, in ``progression`` order ("lrcp" or "rlcp")).

    ``tile_size=(tw, th)`` tiles the image on an origin-anchored grid
    (one SOT tile segment per tile, raster order); ``tile_parts``
    additionally splits each tile's packet sequence into that many
    SOT tile-part segments (contiguous packet runs, tpsot 0..n-1) —
    the layout large-image encoders emit.

    ``irreversible=True`` selects the 9/7 float transform with Annex-E
    scalar quantization: ``quant_style`` picks the QCD form
    ("expounded" = one 16-bit ε/μ per subband, "derived" = a single
    pair the decoder expands via Eq E-5), ``eps_shift`` coarsens every
    step size by 2^eps_shift (0 → Δ_b = 2^0·(1+μ/2^11), near-lossless)
    and ``mantissa`` is the 11-bit μ applied to every band.

    ``precincts`` — user-defined precinct sizes (COD Scod bit 0): one
    (PPx, PPy) exponent pair for all resolutions or a per-resolution
    list of ``levels + 1``; packets then go per precinct with
    per-precinct-band tag trees and the effective code-block clamped
    to the precinct band. ``sop``/``eph`` frame every packet with
    Start-Of-Packet / End-of-Packet-Header markers (Scod bits 1/2).
    ``poc`` emits a POC marker: entries (RSpoc, LYEpoc, REpoc,
    progression-name) — the packet stream follows the volumes in
    order, first volume wins, and they must jointly cover every
    packet. ``progression`` accepts "lrcp", "rlcp" or "rpcl"."""
    arr = np.asarray(samples, dtype=np.int64)
    if arr.ndim != 2:
        raise ValueError("encode_j2k expects a 2-D array")
    h, w = arr.shape
    lo = -(1 << (precision - 1)) if signed else 0
    hi = (1 << (precision - 1)) - 1 if signed else (1 << precision) - 1
    if arr.min(initial=0) < lo or arr.max(initial=0) > hi:
        raise ValueError("sample out of declared precision range")
    cbw, cbh = cb_size
    if cbw & (cbw - 1) or cbh & (cbh - 1) or not 4 <= cbw <= 1024 or not 4 <= cbh <= 1024:
        raise ValueError("code-block dims must be powers of two in [4,1024]")
    if cbw * cbh > 4096:
        raise ValueError("code-block area above 4096")
    levels = int(levels)
    if not 0 <= levels <= 32:
        raise ValueError("levels out of range")

    if irreversible and quant_style not in ("expounded", "derived"):
        raise ValueError(f"unknown quant_style {quant_style!r}")
    if not 0 <= mantissa <= 0x7FF:
        raise ValueError("mantissa must fit 11 bits")
    if eps_shift < 0:
        raise ValueError("eps_shift must be non-negative")
    if not 1 <= layers <= 64:
        raise ValueError("layers out of range [1, 64]")
    _PROGS = {"lrcp": 0, "rlcp": 1, "rpcl": 2}
    if progression not in _PROGS:
        raise ValueError(f"unknown progression {progression!r}")
    prog_code = _PROGS[progression]

    prec_list: list[tuple[int, int]] | None = None
    if precincts is not None:
        prec_list = (
            list(precincts)
            if isinstance(precincts, list)
            else [tuple(precincts)] * (levels + 1)
        )
        if len(prec_list) != levels + 1:
            raise ValueError("precincts list must have levels + 1 entries")
        for r, (ppx, ppy) in enumerate(prec_list):
            if not (0 <= ppx <= 15 and 0 <= ppy <= 15):
                raise ValueError("precinct exponents out of [0, 15]")
            if r > 0 and (ppx < 1 or ppy < 1):
                raise ValueError("PPx/PPy must be ≥ 1 for r > 0")

    poc_entries: list[tuple[int, int, int, int]] | None = None
    if poc is not None:
        poc_entries = []
        for rs, lye, re_, pname in poc:
            if pname not in _PROGS:
                raise ValueError(f"unknown POC progression {pname!r}")
            if not (0 <= rs < re_ <= levels + 1 and 1 <= lye <= layers):
                raise ValueError("POC volume bounds out of range")
            poc_entries.append((rs, lye, re_, _PROGS[pname]))

    tsw, tsh = tile_size if tile_size is not None else (w, h)
    if tsw < 1 or tsh < 1:
        raise ValueError("tile_size dims must be positive")
    ntx, nty = -(-w // tsw), -(-h // tsh)
    if not 1 <= tile_parts <= 255:
        raise ValueError("tile_parts out of range [1, 255]")

    shifted = arr if signed else arr - (1 << (precision - 1))
    guard = 2

    # per-band ε_b, QCD order (LL, then per-res HL/LH/HH) — data-
    # independent, shared by every tile
    names_by_band: list[str] = ["LL"]
    for _r in range(1, levels + 1):
        names_by_band += ["HL", "LH", "HH"]
    exps = []
    for i, name in enumerate(names_by_band):
        if not irreversible:
            exps.append(precision + _GAIN[name])
        elif quant_style == "derived":
            # decoder derives ε_b = ε₀ − N_L + n_b from the LL pair
            # (ε₀ = precision + gain_LL − eps_shift); replicate that
            # expansion here so both sides quantize identically
            e0 = precision + _GAIN["LL"] - eps_shift
            n_b = levels if i == 0 else levels - (i - 1) // 3
            exps.append(e0 - levels + n_b)
        else:
            exps.append(precision + _GAIN[name] - eps_shift)
    if irreversible and (min(exps) < 1 or max(exps) > 31):
        raise ValueError(
            "quantization exponent out of the 5-bit range; reduce "
            "eps_shift or levels"
        )

    def _tile_band_arrays(tile_shifted: np.ndarray):
        if irreversible:
            llf, dwt_bands_f = _fdwt97(tile_shifted, levels)
            fbands: list[list[np.ndarray]] = [[llf]]
            for r in range(1, levels + 1):
                fbands.append(list(dwt_bands_f[r - 1]))
            band_arrays = []
            bi_flat = 0
            for r in range(levels + 1):
                row = []
                for fb in fbands[r]:
                    name = names_by_band[bi_flat]
                    r_b = precision + _GAIN[name]
                    delta = (2.0 ** (r_b - exps[bi_flat])) * (
                        1.0 + mantissa / 2048.0
                    )
                    row.append(
                        (np.sign(fb) * np.floor(np.abs(fb) / delta)).astype(
                            np.int64
                        )
                    )
                    bi_flat += 1
                band_arrays.append(row)
            return band_arrays
        ll, dwt_bands = _fdwt53(tile_shifted, levels)
        band_arrays = [[ll]]
        for r in range(1, levels + 1):
            band_arrays.append(list(dwt_bands[r - 1]))
        return band_arrays

    # markers ----------------------------------------------------------
    def seg(marker: int, body: bytes) -> bytes:
        return struct.pack(">HH", marker, len(body) + 2) + body

    siz = struct.pack(
        ">HIIIIIIIIH", 0, w, h, 0, 0, tsw, tsh, 0, 0, 1
    ) + bytes([(precision - 1) | (0x80 if signed else 0), 1, 1])
    scod = (
        (1 if prec_list is not None else 0)
        | (2 if sop else 0)
        | (4 if eph else 0)
    )
    cod = bytes([scod, prog_code]) + struct.pack(
        ">H", layers
    ) + bytes([
        0, levels,
        int(math.log2(cbw)) - 2, int(math.log2(cbh)) - 2, 0,
        0 if irreversible else 1,
    ])
    if prec_list is not None:
        cod += bytes((ppy << 4) | ppx for ppx, ppy in prec_list)
    if not irreversible:
        qcd = bytes([guard << 5]) + bytes(e << 3 for e in exps)
    elif quant_style == "derived":
        e0 = precision + _GAIN["LL"] - eps_shift  # ε₀ (the LL pair)
        qcd = bytes([(guard << 5) | 1]) + struct.pack(
            ">H", (e0 << 11) | mantissa
        )
    else:
        qcd = bytes([(guard << 5) | 2]) + b"".join(
            struct.pack(">H", (e << 11) | mantissa) for e in exps
        )

    # packets -----------------------------------------------------------
    # T1-encode every code block ONCE; its single MQ codeword is
    # sliced into per-layer segments at pass boundaries (the decoder
    # concatenates a block's segments before decoding, so the slice
    # positions only choose how many passes ship per layer — the
    # rate-estimate boundaries from _t1_encode are the realistic ones)
    def _tile_packets(band_arrays, tw: int, th: int) -> list[bytes]:
        geometry = _band_geometry(tw, th, levels)
        res_bands = _encode_res_bands(
            geometry, band_arrays, cbw, cbh, guard, exps, layers,
            tw, th, levels, prec_list,
        )
        n_prec_by_res = [
            _res_precincts(tw, th, levels, r, prec_list)[2]
            * _res_precincts(tw, th, levels, r, prec_list)[3]
            for r in range(levels + 1)
        ]
        order = _packet_order(
            prog_code, layers, levels, n_prec_by_res, poc_entries
        )
        pkts = []
        for nsop, (l, r, p) in enumerate(order):
            header, body = _emit_packet(res_bands[r], l, p)
            pkt = bytearray()
            if sop:
                pkt += b"\xff\x91\x00\x04" + struct.pack(">H", nsop & 0xFFFF)
            pkt += header
            if eph:
                pkt += b"\xff\x92"
            pkt += body
            pkts.append(bytes(pkt))
        return pkts

    stream = bytearray(
        struct.pack(">H", _SOC) + seg(_SIZ, siz) + seg(_COD, cod)
        + seg(_QCD, qcd)
    )
    if poc_entries is not None:
        stream += seg(_POC, b"".join(
            struct.pack(">BBHBBB", rs, 0, lye, re_, 1, ppoc)
            for rs, lye, re_, ppoc in poc_entries
        ))
    for isot in range(ntx * nty):
        ty, tx = divmod(isot, ntx)
        x0, y0 = tx * tsw, ty * tsh
        tw, th = min(tsw, w - x0), min(tsh, h - y0)
        pkts = _tile_packets(
            _tile_band_arrays(shifted[y0 : y0 + th, x0 : x0 + tw]), tw, th
        )
        # split the tile's packet sequence into contiguous tile-parts
        n_parts = max(1, min(tile_parts, len(pkts)))
        bounds = [round(len(pkts) * j / n_parts) for j in range(n_parts + 1)]
        for tpsot in range(n_parts):
            body = b"".join(pkts[bounds[tpsot] : bounds[tpsot + 1]])
            psot = 12 + 2 + len(body)
            stream += (
                struct.pack(">HH", _SOT, 10)
                + struct.pack(">HIBB", isot, psot, tpsot, n_parts)
                + struct.pack(">H", _SOD)
                + body
            )
    return bytes(stream + struct.pack(">H", _EOC))


def _encode_res_bands(geometry, band_arrays, cbw, cbh, guard, exps, layers,
                      tw, th, levels, prec_list):
    """T1-encode one tile's code blocks and build its per-resolution
    band state grouped by PRECINCT (segments per layer, per-precinct
    tag trees, lblock/included) — the mirror of _decode_tile's
    bookkeeping; with no user precincts this is one precinct per
    resolution, bit-identical to the pre-precinct layout."""
    res_bands = []
    for r, bands in enumerate(geometry):
        ppx, ppy, npx, npy = _res_precincts(tw, th, levels, r, prec_list)
        s = 0 if r == 0 else 1
        blist = []
        for bi, (name, bw, bh) in enumerate(bands):
            cbw_e = min(cbw, 1 << max(ppx - s, 0))
            cbh_e = min(cbh, 1 << max(ppy - s, 0))
            arr_b = band_arrays[r][bi]
            mb = guard + exps[0 if r == 0 else 1 + 3 * (r - 1) + bi] - 1
            precincts = []
            for pyi in range(npy):
                for pxi in range(npx):
                    px0 = min(pxi << (ppx - s), bw)
                    py0 = min(pyi << (ppy - s), bh)
                    px1 = min((pxi + 1) << (ppx - s), bw)
                    py1 = min((pyi + 1) << (ppy - s), bh)
                    pw, ph = px1 - px0, py1 - py0
                    gx, gy = _cb_grid(pw, ph, cbw_e, cbh_e)
                    results = np.empty((max(gy, 1), max(gx, 1)), object)
                    results[:] = None
                    # inclusion tag-tree value = first contributing
                    # layer (``layers`` = never contributes)
                    incl_vals = np.full(
                        (max(gy, 1), max(gx, 1)), layers, np.int32
                    )
                    zbp_vals = np.zeros((max(gy, 1), max(gx, 1)), np.int32)
                    for gyi in range(gy):
                        for gxi in range(gx):
                            x0 = px0 + gxi * cbw_e
                            y0 = py0 + gyi * cbh_e
                            blk = arr_b[
                                y0 : min(y0 + cbh_e, py1),
                                x0 : min(x0 + cbw_e, px1),
                            ]
                            res = _t1_encode(blk, name, mb)
                            if res is None:
                                continue
                            data, npasses, used, rates = res
                            cums = [
                                min(
                                    int(round(npasses * (j + 1) / layers)),
                                    npasses,
                                )
                                for j in range(layers)
                            ]
                            cums[-1] = npasses
                            segs: list[tuple[int, bytes]] = []
                            prev_c = prev_pos = 0
                            first_layer = None
                            for j, cj in enumerate(cums):
                                np_new = cj - prev_c
                                pos = max(rates[cj - 1] if cj else 0, prev_pos)
                                segs.append((np_new, data[prev_pos:pos]))
                                if np_new and first_layer is None:
                                    first_layer = j
                                prev_c, prev_pos = cj, pos
                            incl_vals[gyi, gxi] = first_layer
                            zbp_vals[gyi, gxi] = mb - used
                            results[gyi, gxi] = segs
                    incl = _TagTree(max(gx, 1), max(gy, 1))
                    imsb = _TagTree(max(gx, 1), max(gy, 1))
                    incl.set_values(incl_vals)
                    imsb.set_values(zbp_vals)
                    precincts.append({
                        "gx": gx, "gy": gy,
                        "results": results, "incl": incl, "imsb": imsb,
                        "lblocks": np.full(
                            (max(gy, 1), max(gx, 1)), 3, np.int32
                        ),
                        "included": np.zeros(
                            (max(gy, 1), max(gx, 1)), bool
                        ),
                    })
            blist.append({"bw": bw, "bh": bh, "precincts": precincts})
        res_bands.append(blist)
    return res_bands


def _emit_packet(blist, l: int, p: int) -> tuple[bytes, bytes]:
    """Emit one (layer, resolution, precinct) packet from the band
    state → (header, body) so the caller can frame with SOP/EPH."""
    any_contrib = any(
        band["precincts"][p]["results"][gyi, gxi] is not None
        and band["precincts"][p]["results"][gyi, gxi][l][0] > 0
        for band in blist
        for gyi in range(band["precincts"][p]["gy"])
        for gxi in range(band["precincts"][p]["gx"])
    )
    wr = _HeaderBitWriter()
    if not any_contrib:
        # empty packet: single 0 bit, tag-tree state untouched
        # (the decoder skips all signaling for it)
        wr.bit(0)
        return wr.tobytes(), b""
    wr.bit(1)
    bodies = bytearray()
    for band in blist:
        if band["bw"] == 0 or band["bh"] == 0:
            continue
        pr = band["precincts"][p]
        for gyi in range(pr["gy"]):
            for gxi in range(pr["gx"]):
                res = pr["results"][gyi, gxi]
                if pr["included"][gyi, gxi]:
                    np_new, segbytes = res[l]
                    wr.bit(1 if np_new else 0)
                    if not np_new:
                        continue
                else:
                    pr["incl"].encode(gxi, gyi, l + 1, wr)
                    if res is None or res[l][0] == 0:
                        continue  # not included by this layer
                    pr["included"][gyi, gxi] = True
                    # resolve the zero-bit-plane count fully (the
                    # huge threshold stops at the leaf value,
                    # openjpeg-style)
                    pr["imsb"].encode(gxi, gyi, 1 << 20, wr)
                    np_new, segbytes = res[l]
                _write_npasses(wr, np_new)
                nbits = int(pr["lblocks"][gyi, gxi]) + int(
                    math.floor(math.log2(np_new))
                )
                while len(segbytes) >= (1 << nbits):
                    wr.bit(1)
                    pr["lblocks"][gyi, gxi] += 1
                    nbits += 1
                wr.bit(0)
                wr.bits(len(segbytes), nbits)
                bodies += segbytes
    return wr.tobytes(), bytes(bodies)
