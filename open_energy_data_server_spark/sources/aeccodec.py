"""Pure-Python CCSDS 121.0 (Rice/AEC) decoder — GRIB2 template 5.42.

Completes the GRIB2 surface for the packing DWD's open-data GRIB2
files ship today: "CCSDS recommended lossless compression" (data
representation template 5.42, the libaec/szip bitstream). The
reference reads these via cfgrib/eccodes (which links libaec:
/root/reference/crawler/dwd.py:120-147 gets it transparently); this
module supplies the dependency-free equivalent for the engine's
distributed GRIB scan.

Format knowledge is the public CCSDS 121.0-B recommendation (block-
adaptive entropy coding: sample-splitting options, zero-block runs,
second-extension pairs, optional unit-delay predictive preprocessing)
with the framing conventions of libaec — the implementation eccodes
uses and therefore the de-facto meaning of the GRIB2 CCSDS octets:

- Block of J samples (octet 23), reference-sample interval RSI in
  blocks (octets 24-25), flags (octet 22): bit 0 signed, bit 1
  3-byte storage, bit 2 MSB output order, bit 3 preprocessing,
  bit 4 restricted coding, bit 5 pad-RSI. Storage-order flags only
  affect libaec's *byte* output; this decoder emits integers
  directly, so they are accepted and ignored.
- Option ID of ``id_len`` bits (1/2/3/4/5 for n ≤ 2/4/8/16/32):
  all-ones = uncompressed (J raw n-bit samples), 0 = low-entropy
  (one more bit: 0 → zero-block run, 1 → second extension),
  else k-split with k = ID − 1 (all fundamental-sequence prefixes,
  then all k-bit remainders).
- Preprocessing: the first sample of each RSI is a raw reference;
  every other sample is the standard CCSDS delta mapping
  D = 2Δ (Δ≥0) / 2|Δ|−1 (Δ<0) within the symmetric window
  θ = min(p − x_min, x_max − p), else θ + |Δ|.
- Zero-block run length f+1, with f+1 = 5 meaning rest-of-segment
  (64-block segments counted from the RSI start) and f+1 > 5 meaning
  f blocks (the gap the ROS code leaves).
- Second extension: ⌈n/2⌉ FS-coded pair values
  m = (d₀+d₁)(d₀+d₁+1)/2 + d₁; a block whose first slot is the
  reference emits only the second element of its first pair.

A spec-faithful ENCODER (``encode_ccsds``) lives here too — test
infrastructure: property tests round-trip random arrays through
encode → decode, and the unit fixtures hand-build bitstreams per
coding option. It is driver-side-only and never in a query path.

Capability boundary (clean ValueError, decoder-injection seam
upstream in sources/grib.py): signed samples and restricted coding —
GRIB2 fields are unsigned scaled integers and eccodes never sets
restricted mode for them.
"""

from __future__ import annotations

import numpy as np

FLAG_SIGNED = 0x01
FLAG_3BYTE = 0x02
FLAG_MSB = 0x04
FLAG_PREPROCESS = 0x08
FLAG_RESTRICTED = 0x10
FLAG_PAD_RSI = 0x20

_SEGMENT_BLOCKS = 64
_ROS = 5


def _id_len(bits_per_sample: int) -> int:
    if bits_per_sample > 16:
        return 5
    if bits_per_sample > 8:
        return 4
    if bits_per_sample > 4:
        return 3
    if bits_per_sample > 2:
        return 2
    return 1


class _BitReader:
    """MSB-first bit cursor over one ``np.unpackbits`` pass.

    Numpy-vectorized where the stream allows it: fundamental-sequence
    runs come from the precomputed one-bit position index (one
    ``searchsorted`` + one ``diff`` per block, no per-bit loop), and
    fixed-width field runs from one reshape-matmul — so decoding a
    700k-point operational grid is block-granular Python over numpy
    kernels, the same shape as the simple/complex-packing decoders."""

    __slots__ = ("bits", "ones", "nbits", "pos")

    def __init__(self, data: bytes) -> None:
        self.bits = np.unpackbits(np.frombuffer(data, dtype=np.uint8))
        self.ones = np.flatnonzero(self.bits)
        self.nbits = self.bits.size
        self.pos = 0

    def take(self, n: int) -> int:
        """One fixed-width field (ids, extension bits, references)."""
        if self.pos + n > self.nbits:
            raise ValueError("CCSDS stream truncated")
        v = 0
        for bit in self.bits[self.pos : self.pos + n]:
            v = (v << 1) | int(bit)
        self.pos += n
        return v

    def take_fields(self, count: int, width: int) -> np.ndarray:
        """``count`` consecutive unsigned big-endian fields of ``width``
        bits, as one reshape + matmul."""
        need = count * width
        if self.pos + need > self.nbits:
            raise ValueError("CCSDS stream truncated")
        if width == 0:
            return np.zeros(count, dtype=np.int64)
        chunk = self.bits[self.pos : self.pos + need]
        weights = (1 << np.arange(width - 1, -1, -1)).astype(np.int64)
        self.pos += need
        return chunk.reshape(count, width).astype(np.int64) @ weights

    def fs_run(self, count: int, limit: int) -> np.ndarray:
        """``count`` consecutive fundamental-sequence values (zeros
        before each terminating 1), via the one-bit position index."""
        if count == 0:
            return np.zeros(0, dtype=np.int64)
        idx = int(np.searchsorted(self.ones, self.pos))
        if idx + count > self.ones.size:
            raise ValueError("CCSDS stream truncated in FS code")
        p = self.ones[idx : idx + count].astype(np.int64)
        fs = np.diff(np.concatenate(([self.pos - 1], p))) - 1
        if int(fs.max()) > limit:
            raise ValueError(
                f"CCSDS FS value exceeds plausible bound {limit}"
            )
        self.pos = int(p[-1]) + 1
        return fs

    def fs(self, limit: int) -> int:
        return int(self.fs_run(1, limit)[0])

    def align_byte(self) -> None:
        self.pos = (self.pos + 7) & ~7


def _unmap_delta(d: int, prev: int, xmax: int) -> int:
    """Inverse of the CCSDS unit-delay delta mapping (unsigned range)."""
    theta = min(prev, xmax - prev)
    if d <= 2 * theta:
        return prev + (d >> 1) if d % 2 == 0 else prev - ((d + 1) >> 1)
    mag = d - theta
    return prev + mag if prev < xmax - prev else prev - mag


def decode_ccsds(
    data: bytes,
    n_samples: int,
    bits_per_sample: int,
    flags: int,
    block_size: int,
    rsi: int,
) -> np.ndarray:
    """Decode a CCSDS 121.0 stream to ``n_samples`` unsigned ints."""
    if not 1 <= bits_per_sample <= 32:
        raise ValueError(f"CCSDS bits-per-sample {bits_per_sample} unsupported")
    if flags & FLAG_SIGNED:
        raise ValueError("CCSDS signed samples unsupported (GRIB2 is unsigned)")
    if flags & FLAG_RESTRICTED:
        raise ValueError("CCSDS restricted coding unsupported")
    if block_size not in (8, 16, 32, 64):
        raise ValueError(f"CCSDS block size {block_size} unsupported")
    if rsi < 1:
        raise ValueError(f"CCSDS reference sample interval {rsi} invalid")
    if n_samples < 0:
        raise ValueError("negative sample count")

    pp = bool(flags & FLAG_PREPROCESS)
    xmax = (1 << bits_per_sample) - 1
    id_len = _id_len(bits_per_sample)
    uncomp_id = (1 << id_len) - 1
    per_rsi = rsi * block_size
    # FS bound: a valid FS code never exceeds the sample dynamic range
    # by much; 2·xmax covers split remainders and SE pair values at
    # k=0 while keeping a corrupt all-zeros stream from spinning.
    fs_limit = max(2 * xmax + 2, 2 * _SEGMENT_BLOCKS)

    br = _BitReader(data)
    out = np.zeros(n_samples, dtype=np.uint32)
    se_bound = (2 * xmax + 1) * (xmax + 1)
    pos = 0
    while pos < n_samples:
        rsi_start = pos
        rsi_end = min(rsi_start + per_rsi, n_samples)
        blocks_in_rsi = (min(per_rsi, n_samples - rsi_start) + block_size - 1) // block_size
        b = 0  # block index within this RSI
        parts: list[np.ndarray] = []  # mapped samples for this RSI
        while b < blocks_in_rsi:
            ref = 1 if (pp and b == 0) else 0
            opt = br.take(id_len)
            if opt == uncomp_id:
                # raw n-bit samples, reference included as the first
                parts.append(br.take_fields(block_size, bits_per_sample))
                b += 1
            elif opt == 0:
                se = br.take(1)
                if ref:
                    parts.append(br.take_fields(1, bits_per_sample))
                if se:
                    n_mapped = block_size - ref
                    # SE pair values m range up to (2·xmax+1)(xmax+1) for
                    # spec-valid (if non-cost-minimal) encoders — wider
                    # than fs_limit, so the SE branch gets its own bound
                    # (the reader still stops at end-of-stream, so a
                    # corrupt unary run cannot spin past the data).
                    ms = br.fs_run((n_mapped + 1) // 2, se_bound)
                    if int(ms.max(initial=0)) > se_bound:
                        raise ValueError(
                            "CCSDS second-extension value out of range"
                        )
                    s = ((np.sqrt(8.0 * ms + 1.0) - 1.0) / 2.0).astype(np.int64)
                    # float sqrt can land one off at triangular bounds
                    s -= s * (s + 1) // 2 > ms
                    s += (s + 1) * (s + 2) // 2 <= ms
                    d1 = ms - s * (s + 1) // 2
                    d0 = s - d1
                    blk = np.empty(n_mapped, dtype=np.int64)
                    if ref:
                        # first pair straddles the reference slot: only
                        # its second element belongs to the stream
                        blk[0] = d1[0]
                        blk[1::2] = d0[1:]
                        blk[2::2] = d1[1:]
                    else:
                        blk[0::2] = d0
                        blk[1::2] = d1
                    parts.append(blk)
                    b += 1
                else:
                    f = br.fs(fs_limit)
                    zb = f + 1
                    if zb == _ROS:
                        zb = _SEGMENT_BLOCKS - (b % _SEGMENT_BLOCKS)
                    elif zb > _ROS:
                        zb -= 1
                    zb = min(zb, blocks_in_rsi - b)
                    parts.append(
                        np.zeros(zb * block_size - ref, dtype=np.int64)
                    )
                    b += zb
            else:
                k = opt - 1
                n = block_size - ref
                if ref:
                    parts.append(br.take_fields(1, bits_per_sample))
                fs_parts = br.fs_run(n, fs_limit)
                if k:
                    parts.append((fs_parts << k) | br.take_fields(n, k))
                else:
                    parts.append(fs_parts)
                b += 1
        take_n = rsi_end - rsi_start
        buf = np.concatenate(parts) if parts else np.zeros(0, dtype=np.int64)
        if buf.size < take_n:
            raise ValueError("CCSDS RSI decoded short")
        buf = buf[:take_n]
        if pp:
            ref_val = int(buf[0])
            if ref_val > xmax:
                raise ValueError("CCSDS reference sample exceeds dynamic range")
            deltas = buf[1:]
            # fast path: within the symmetric window θ the inverse
            # mapping is prev-independent, so the chain is one cumsum;
            # validity is re-checked against the reconstructed values
            # (induction: a passing check proves every step was
            # in-window, hence exact). Edge-hugging fields fall back.
            signed = np.where(deltas % 2 == 0, deltas >> 1, -((deltas + 1) >> 1))
            x = ref_val + np.cumsum(signed)
            xprev = np.concatenate(([ref_val], x[:-1]))
            theta = np.minimum(xprev, xmax - xprev)
            if (deltas <= 2 * theta).all():
                out[rsi_start] = ref_val
                out[rsi_start + 1 : rsi_end] = x
            else:
                prev = ref_val
                out[rsi_start] = prev
                for i in range(1, take_n):
                    prev = _unmap_delta(int(buf[i]), prev, xmax)
                    if not 0 <= prev <= xmax:
                        raise ValueError("CCSDS delta underflow/overflow")
                    out[rsi_start + i] = prev
        else:
            if buf.size and int(buf.max()) > xmax:
                raise ValueError("CCSDS sample exceeds dynamic range")
            out[rsi_start:rsi_end] = buf.astype(np.uint32)
        pos = rsi_end
        if flags & FLAG_PAD_RSI:
            br.align_byte()
    return out


# ----------------------------------------------------------------- #
# Test-infrastructure encoder (driver-side only, never in a query    #
# path): emits a valid CCSDS 121.0 stream for round-trip tests.      #
# ----------------------------------------------------------------- #


class _BitWriter:
    __slots__ = ("bits",)

    def __init__(self) -> None:
        self.bits: list[int] = []

    def put(self, v: int, n: int) -> None:
        self.bits.extend((v >> (n - 1 - i)) & 1 for i in range(n))

    def fs(self, v: int) -> None:
        self.bits.extend([0] * v)
        self.bits.append(1)

    def align_byte(self) -> None:
        self.bits.extend([0] * (-len(self.bits) % 8))

    def tobytes(self) -> bytes:
        self.align_byte()
        return bytes(
            int("".join(map(str, self.bits[i : i + 8])), 2)
            for i in range(0, len(self.bits), 8)
        )


def _map_delta(x: int, prev: int, xmax: int) -> int:
    delta = x - prev
    theta = min(prev, xmax - prev)
    if -theta <= delta <= theta:
        return 2 * delta if delta >= 0 else 2 * (-delta) - 1
    return theta + abs(delta)


def encode_ccsds(
    samples,
    bits_per_sample: int,
    flags: int = FLAG_PREPROCESS,
    block_size: int = 16,
    rsi: int = 128,
) -> bytes:
    """Encode unsigned ints as a CCSDS 121.0 stream (tests only)."""
    if flags & (FLAG_SIGNED | FLAG_RESTRICTED):
        raise ValueError("signed/restricted encoding unsupported")
    if bits_per_sample < 3:
        # id_len=1 leaves no split-sample options (max_k < 0); the n≤2
        # low-entropy coding tables are out of scope for a test encoder
        raise ValueError("bits_per_sample < 3 unsupported by test encoder")
    xs = [int(v) for v in samples]
    xmax = (1 << bits_per_sample) - 1
    if any(not 0 <= v <= xmax for v in xs):
        raise ValueError("sample out of dynamic range")
    pp = bool(flags & FLAG_PREPROCESS)
    id_len = _id_len(bits_per_sample)
    uncomp_id = (1 << id_len) - 1
    max_k = uncomp_id - 2
    per_rsi = rsi * block_size
    bw = _BitWriter()

    for rsi_start in range(0, len(xs), per_rsi):
        chunk = xs[rsi_start : rsi_start + per_rsi]
        # map: raw reference + deltas (pad the tail block with zeros,
        # which the decoder discards past n_samples)
        if pp:
            mapped = [chunk[0]]
            mapped += [
                _map_delta(chunk[i], chunk[i - 1], xmax)
                for i in range(1, len(chunk))
            ]
        else:
            mapped = list(chunk)
        pad = -len(mapped) % block_size
        mapped += [0] * pad
        n_blocks = len(mapped) // block_size

        b = 0
        while b < n_blocks:
            block = mapped[b * block_size : (b + 1) * block_size]
            ref = 1 if (pp and b == 0) else 0
            body = block[ref:]
            # zero-run: collect consecutive all-zero blocks
            if not any(body):
                run = 1
                while (
                    b + run < n_blocks
                    and (b + run) % _SEGMENT_BLOCKS != 0
                    and not any(
                        mapped[(b + run) * block_size : (b + run + 1) * block_size]
                    )
                ):
                    run += 1
                seg_left = _SEGMENT_BLOCKS - (b % _SEGMENT_BLOCKS)
                is_ros = run == seg_left or b + run == n_blocks and run >= _ROS
                bw.put(0, id_len)
                bw.put(0, 1)
                if ref:
                    bw.put(block[0], bits_per_sample)
                if is_ros and run == seg_left:
                    bw.fs(_ROS - 1)
                elif run < _ROS:
                    bw.fs(run - 1)
                else:
                    bw.fs(run)
                b += run
                continue
            # candidate costs
            fs_cost = [sum((v >> k) for v in body) + len(body) + k * len(body)
                       for k in range(0, max_k + 1)]
            best_k = int(np.argmin(fs_cost))
            best_cost = fs_cost[best_k]
            se_cost = None
            if len(body) % 2 == 0 or ref:
                pairs = []
                i = 0
                seq = body
                if ref and len(seq) % 2 == 1:
                    pairs.append((0, seq[0]))
                    i = 1
                while i < len(seq):
                    pairs.append((seq[i], seq[i + 1]))
                    i += 2
                ms = [
                    (d0 + d1) * (d0 + d1 + 1) // 2 + d1 for d0, d1 in pairs
                ]
                se_cost = 1 + sum(ms) + len(ms)
            uncomp_cost = block_size * bits_per_sample
            if se_cost is not None and se_cost < best_cost and se_cost < uncomp_cost:
                bw.put(0, id_len)
                bw.put(1, 1)
                if ref:
                    bw.put(block[0], bits_per_sample)
                for m in ms:
                    bw.fs(m)
            elif best_cost < uncomp_cost:
                bw.put(best_k + 1, id_len)
                if ref:
                    bw.put(block[0], bits_per_sample)
                for v in body:
                    bw.fs(v >> best_k)
                for v in body:
                    if best_k:
                        bw.put(v & ((1 << best_k) - 1), best_k)
            else:
                bw.put(uncomp_id, id_len)
                for v in block:
                    bw.put(v, bits_per_sample)
            b += 1
        if flags & FLAG_PAD_RSI:
            bw.align_byte()
    return bw.tobytes()
