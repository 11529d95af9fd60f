"""CCSDS 121.0 (AEC/Rice) codec — GRIB2 template 5.42.

Fixtures are hand-built bitstreams per coding option (values computed
by hand from the CCSDS 121.0-B coding rules); property tests
round-trip random arrays through the spec-faithful test encoder.
"""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from open_energy_data_server_spark.sources.aeccodec import (
    FLAG_MSB,
    FLAG_PAD_RSI,
    FLAG_PREPROCESS,
    FLAG_RESTRICTED,
    FLAG_SIGNED,
    decode_ccsds,
    encode_ccsds,
)
from tests.test_grib2codec import make_grib2


def bits(*chunks: str) -> bytes:
    s = "".join(chunks).replace(" ", "")
    s += "0" * (-len(s) % 8)
    return bytes(int(s[i : i + 8], 2) for i in range(0, len(s), 8))


# --------------------------------------------------------------- #
# hand-built bitstreams, one per coding option (no preprocessing   #
# unless noted; bps=8 → id_len=3, uncompressed id=0b111)           #
# --------------------------------------------------------------- #


def test_uncompressed_block():
    # one block of 8 raw 8-bit samples, id=111
    xs = [3, 0, 255, 17, 4, 4, 200, 9]
    stream = bits("111", *[format(v, "08b") for v in xs])
    out = decode_ccsds(stream, 8, 8, 0, 8, 16)
    assert out.tolist() == xs


def test_split_k0_is_fundamental_sequence():
    # id=001 → k=0: each sample is a pure FS code (v zeros then a 1)
    xs = [0, 2, 1, 0, 3, 0, 0, 1]
    fs = "".join("0" * v + "1" for v in xs)
    out = decode_ccsds(bits("001", fs), 8, 8, 0, 8, 16)
    assert out.tolist() == xs


def test_split_k2_fs_then_remainders():
    # id=011 → k=2: FS of v>>2 for all 8 samples, then 2-bit remainders
    xs = [4, 5, 6, 7, 0, 1, 11, 2]
    fs = "".join("0" * (v >> 2) + "1" for v in xs)
    rem = "".join(format(v & 3, "02b") for v in xs)
    out = decode_ccsds(bits("011", fs, rem), 8, 8, 0, 8, 16)
    assert out.tolist() == xs


def test_zero_block_run():
    # id=000 + '0' ext bit + FS(1) → 2 zero blocks, then an uncomp block
    tail = [9] * 8
    stream = bits("000 0", "01", "111", *[format(v, "08b") for v in tail])
    out = decode_ccsds(stream, 24, 8, 0, 8, 16)
    assert out.tolist() == [0] * 16 + tail


def test_zero_block_ros_runs_to_segment_end():
    # FS value 4 → f+1 == 5 == ROS → zeros to the end of the 64-block
    # segment; here the RSI has only 4 blocks, so ROS is clamped
    stream = bits("000 0", "00001")
    out = decode_ccsds(stream, 32, 8, 0, 8, 16)
    assert out.tolist() == [0] * 32


def test_zero_block_count_above_ros_shifts_by_one():
    # f+1 = 7 → count is f = 6 zero blocks
    stream = bits("000 0", "0000001", "001", "".join("1" for _ in range(8)))
    out = decode_ccsds(stream, 56, 8, 0, 8, 16)
    assert out.tolist() == [0] * 48 + [0] * 8  # 6 zero blocks + k=0 zeros...


def test_second_extension_pairs():
    # id=000 + '1' ext bit; pairs (d0,d1) with m=(d0+d1)(d0+d1+1)/2+d1:
    # (0,0)→0, (1,0)→1, (0,1)→2, (1,1)→4 — FS-coded m values
    ms = [0, 1, 2, 4]
    fs = "".join("0" * m + "1" for m in ms)
    out = decode_ccsds(bits("000 1", fs), 8, 8, 0, 8, 16)
    assert out.tolist() == [0, 0, 1, 0, 0, 1, 1, 1]


def test_preprocessing_reference_and_deltas():
    # pp on: first sample raw 8-bit reference (100), then mapped deltas
    # via FS (k=0 split): D=2 → Δ=+1, D=1 → Δ=−1, D=0 → Δ=0
    ds = [2, 1, 0, 2, 2, 1, 0]
    fs = "".join("0" * d + "1" for d in ds)
    stream = bits("001", format(100, "08b"), fs)
    out = decode_ccsds(stream, 8, 8, FLAG_PREPROCESS, 8, 16)
    assert out.tolist() == [100, 101, 100, 100, 101, 102, 101, 101]


def test_preprocessing_out_of_window_delta():
    # prev=1 → θ=1; D=5 > 2θ → |Δ|=D−θ=4, prev < xmax−prev → Δ=+4
    stream = bits("001", format(1, "08b"), "000001", "1", *["1"] * 6)
    out = decode_ccsds(stream, 8, 8, FLAG_PREPROCESS, 8, 16)
    assert out.tolist() == [1, 5, 5, 5, 5, 5, 5, 5]


def test_truncated_stream_raises():
    with pytest.raises(ValueError, match="truncated"):
        decode_ccsds(bits("111", "0000"), 8, 8, 0, 8, 16)


def test_signed_and_restricted_raise():
    with pytest.raises(ValueError, match="signed"):
        decode_ccsds(b"\x00", 8, 8, FLAG_SIGNED, 8, 16)
    with pytest.raises(ValueError, match="restricted"):
        decode_ccsds(b"\x00", 8, 8, FLAG_RESTRICTED, 8, 16)
    with pytest.raises(ValueError, match="block size"):
        decode_ccsds(b"\x00", 8, 8, 0, 12, 16)


def test_all_zero_corrupt_stream_raises_not_spins():
    with pytest.raises(ValueError):
        decode_ccsds(b"\x00" * 64, 512, 16, 0, 16, 128)


# --------------------------------------------------------------- #
# encoder round-trips                                              #
# --------------------------------------------------------------- #


@pytest.mark.parametrize("flags", [0, FLAG_PREPROCESS, FLAG_PREPROCESS | FLAG_MSB])
@pytest.mark.parametrize("bps", [4, 8, 12, 16, 24])
def test_roundtrip_smooth_field(flags, bps):
    rng = np.random.default_rng(bps * 1000 + flags)
    xmax = (1 << bps) - 1
    walk = np.cumsum(rng.integers(-3, 4, size=700)) + xmax // 2
    xs = np.clip(walk, 0, xmax).astype(np.uint32)
    enc = encode_ccsds(xs, bps, flags=flags, block_size=16, rsi=32)
    out = decode_ccsds(enc, len(xs), bps, flags, 16, 32)
    assert out.tolist() == xs.tolist()
    if flags & FLAG_PREPROCESS:
        # a smooth field must actually compress
        assert len(enc) < len(xs) * bps / 8


@pytest.mark.parametrize("block_size", [8, 16, 32, 64])
def test_roundtrip_constant_field_zero_blocks(block_size):
    xs = np.full(1000, 77, dtype=np.uint32)
    enc = encode_ccsds(xs, 10, flags=FLAG_PREPROCESS, block_size=block_size, rsi=64)
    out = decode_ccsds(enc, len(xs), 10, FLAG_PREPROCESS, block_size, 64)
    assert out.tolist() == xs.tolist()
    assert len(enc) < 60  # near-pure zero-run coding


def test_roundtrip_pad_rsi():
    rng = np.random.default_rng(7)
    xs = rng.integers(0, 255, size=300).astype(np.uint32)
    flags = FLAG_PREPROCESS | FLAG_PAD_RSI
    enc = encode_ccsds(xs, 8, flags=flags, block_size=16, rsi=4)
    out = decode_ccsds(enc, len(xs), 8, flags, 16, 4)
    assert out.tolist() == xs.tolist()


@settings(max_examples=30, deadline=None)
@given(
    st.lists(st.integers(0, 4095), min_size=1, max_size=400),
    st.sampled_from([16, 32]),
    st.sampled_from([0, FLAG_PREPROCESS]),
)
def test_roundtrip_property(xs, block_size, flags):
    enc = encode_ccsds(xs, 12, flags=flags, block_size=block_size, rsi=16)
    out = decode_ccsds(enc, len(xs), 12, flags, block_size, 16)
    assert out.tolist() == xs


# --------------------------------------------------------------- #
# GRIB2 template 5.42 end-to-end                                   #
# --------------------------------------------------------------- #


def _aec_grib2(xs, ni, nj, bps=12, flags=FLAG_PREPROCESS | FLAG_MSB,
               block_size=16, rsi=32, **kw):
    payload = encode_ccsds(xs, bps, flags=flags, block_size=block_size, rsi=rsi)
    return make_grib2(
        list(xs),
        ni,
        nj,
        nbits=bps,
        drs_template=42,
        data_override=payload,
        sec5_extra=bytes([flags, block_size]) + rsi.to_bytes(2, "big"),
        **kw,
    )


def test_grib2_ccsds_template_decodes():
    from open_energy_data_server_spark.sources.grib2codec import decode_grib2

    rng = np.random.default_rng(42)
    ni, nj = 20, 15
    walk = np.cumsum(rng.integers(-5, 6, size=ni * nj)) + 2000
    xs = np.clip(walk, 0, 4095).astype(np.uint32)
    msg = _aec_grib2(xs, ni, nj, r_ref=250.0, e_scale=1, d_scale=1)
    df = decode_grib2(msg)
    assert len(df) == ni * nj
    expect = (250.0 + xs.astype(np.float64) * 2.0) / 10.0
    np.testing.assert_allclose(np.sort(df["value"].values), np.sort(expect))


def test_grib2_ccsds_truncated_payload_raises():
    from open_energy_data_server_spark.sources.grib2codec import decode_grib2

    xs = np.arange(60, dtype=np.uint32) * 17 % 4096
    payload = encode_ccsds(xs, 12, flags=FLAG_PREPROCESS, block_size=16, rsi=32)
    msg = make_grib2(
        list(xs),
        10,
        6,
        nbits=12,
        drs_template=42,
        data_override=payload[:-6],  # consistent framing, short AEC stream
        sec5_extra=bytes([FLAG_PREPROCESS, 16]) + (32).to_bytes(2, "big"),
    )
    with pytest.raises(ValueError, match="CCSDS"):
        decode_grib2(msg)


@settings(max_examples=60, deadline=None)
@given(st.binary(min_size=0, max_size=400), st.sampled_from([8, 12, 16]))
def test_arbitrary_bytes_never_hang_or_crash(blob, bps):
    # any byte soup must decode fully or raise the one allowed error
    try:
        decode_ccsds(blob, 256, bps, FLAG_PREPROCESS, 16, 8)
    except ValueError:
        pass
