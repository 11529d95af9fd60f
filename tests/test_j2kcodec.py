"""Pure-Python JPEG 2000 codec tests (GRIB2 template 5.40 support).

The encoder is spec-faithful but independent of the decoder's parse
path (it lays out markers/packets straight from ISO 15444-1 Annexes
A/B and runs the forward transforms), so round-trips verify the
decoder against the format. The MQ coder, tag trees and 5/3 lifting
additionally get direct unit tests with hand-computed values.
"""

from __future__ import annotations

import struct

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from open_energy_data_server_spark.sources.j2kcodec import (
    _fdwt53,
    _fwd_lift_axis,
    _HeaderBitReader,
    _HeaderBitWriter,
    _idwt53,
    _inv_lift_axis,
    _MQDecoder,
    _MQEncoder,
    _TagTree,
    decode_j2k,
    encode_j2k,
)
from tests.test_grib2codec import make_grib2


# --------------------------------------------------------------- MQ coder


def test_mq_roundtrip_known_pattern():
    bits = [1, 0, 1, 1, 0, 0, 0, 1, 1, 1, 0, 1, 0, 1] * 40
    ctxs = [(i * 7) % 19 for i in range(len(bits))]
    enc = _MQEncoder()
    for b, k in zip(bits, ctxs):
        enc.encode(b, k)
    data = enc.flush()
    dec = _MQDecoder(data)
    out = [dec.decode(k) for k in ctxs]
    assert out == bits


@settings(max_examples=50, deadline=None)
@given(st.lists(st.tuples(st.integers(0, 1), st.integers(0, 18)), max_size=400))
def test_mq_roundtrip_property(pairs):
    enc = _MQEncoder()
    for b, k in pairs:
        enc.encode(b, k)
    data = enc.flush()
    dec = _MQDecoder(data)
    assert [dec.decode(k) for _, k in pairs] == [b for b, _ in pairs]


def test_mq_skewed_stream_compresses():
    # 1000 MPS symbols in one context must compress far below 125 bytes
    enc = _MQEncoder()
    for _ in range(1000):
        enc.encode(0, 5)
    assert len(enc.flush()) < 30


# --------------------------------------------------------------- tag trees


def test_tagtree_roundtrip_grid():
    values = np.array([[1, 3, 2], [2, 0, 4]], np.int32)
    enc_tree = _TagTree(3, 2)
    enc_tree.set_values(values)
    wr = _HeaderBitWriter()
    for y in range(2):
        for x in range(3):
            enc_tree.encode(x, y, 1 << 20, wr)
    data = wr.tobytes()
    dec_tree = _TagTree(3, 2)
    rd = _HeaderBitReader(data, 0)
    for y in range(2):
        for x in range(3):
            t = 1
            while not dec_tree.decode(x, y, t, rd):
                t += 1
            assert dec_tree.low[0][y, x] == values[y, x]


def test_header_bit_stuffing_after_ff():
    wr = _HeaderBitWriter()
    for _ in range(8):
        wr.bit(1)  # 0xFF
    for _ in range(7):
        wr.bit(1)
    data = wr.tobytes()
    assert data[0] == 0xFF and data[1] & 0x80 == 0  # stuffed MSB
    rd = _HeaderBitReader(data, 0)
    assert [rd.bit() for _ in range(15)] == [1] * 15


# --------------------------------------------------------------- 5/3 DWT


def test_lift_hand_computed():
    # x = [10, 12, 14, 16, 20]; forward 5/3 per Annex F:
    # odd: 12 - (10+14)//2 = 0 ; 16 - (14+20)//2 = -1
    # even: 10 + (0+0+2)//4 = 10 ; 14 + (0-1+2)//4 = 14 ;
    #        20 + (-1-1+2)//4 = 20
    x = np.array([10, 12, 14, 16, 20], np.int64)
    f = _fwd_lift_axis(x)
    assert f.tolist() == [10, 0, 14, -1, 20]
    assert _inv_lift_axis(f).tolist() == x.tolist()


@settings(max_examples=60, deadline=None)
@given(
    st.integers(1, 23),
    st.integers(1, 23),
    st.integers(0, 4),
    st.integers(0, 2**31 - 1),
)
def test_dwt2d_roundtrip_property(h, w, levels, seed):
    rng = np.random.default_rng(seed)
    a = rng.integers(-4096, 4096, size=(h, w), dtype=np.int64)
    ll, bands = _fdwt53(a, levels)
    back = _idwt53(ll, bands)
    assert np.array_equal(back, a)


# --------------------------------------------------------- full codestream


@pytest.mark.parametrize(
    ("shape", "prec", "levels", "cb"),
    [
        ((8, 8), 8, 0, (8, 8)),
        ((16, 12), 10, 2, (16, 16)),
        ((7, 9), 8, 2, (8, 8)),
        ((33, 17), 12, 3, (16, 16)),
        ((70, 50), 12, 3, (16, 16)),  # multi-code-block bands
        ((64, 64), 16, 2, (64, 64)),
        ((1, 5), 8, 1, (8, 8)),
        ((5, 1), 8, 2, (8, 8)),
        ((5, 5), 8, 5, (8, 8)),  # more levels than extent
    ],
)
def test_roundtrip_shapes(shape, prec, levels, cb):
    rng = np.random.default_rng(hash(shape) % 2**31)
    a = rng.integers(0, 1 << prec, size=shape, dtype=np.int64)
    assert np.array_equal(decode_j2k(encode_j2k(a, prec, levels, cb)), a)


def test_roundtrip_constant_and_signed():
    for v in (0, 128, 255):
        a = np.full((10, 10), v, np.int64)
        assert np.array_equal(decode_j2k(encode_j2k(a, 8, 2, (16, 16))), a)
    rng = np.random.default_rng(3)
    s = rng.integers(-128, 128, size=(12, 12), dtype=np.int64)
    assert np.array_equal(
        decode_j2k(encode_j2k(s, 8, 2, (16, 16), signed=True)), s
    )


def test_roundtrip_smooth_field():
    g = (
        np.add.outer(np.sin(np.linspace(0, 3, 40)), np.cos(np.linspace(0, 2, 60)))
        * 500
        + 1200
    ).astype(np.int64)
    enc = encode_j2k(g, 12, levels=4, cb_size=(32, 32))
    assert np.array_equal(decode_j2k(enc), g)
    # lossless coding of a smooth field must actually compress
    assert len(enc) < g.size * 12 // 8


@settings(max_examples=40, deadline=None)
@given(
    st.integers(1, 20),
    st.integers(1, 20),
    st.integers(0, 3),
    st.sampled_from([8, 10, 12, 16]),
    st.integers(0, 2**31 - 1),
)
def test_roundtrip_property(h, w, levels, prec, seed):
    rng = np.random.default_rng(seed)
    a = rng.integers(0, 1 << prec, size=(h, w), dtype=np.int64)
    assert np.array_equal(decode_j2k(encode_j2k(a, prec, levels, (8, 8))), a)


def test_marker_layout_spec_fields():
    a = np.arange(12, dtype=np.int64).reshape(3, 4) * 5
    enc = encode_j2k(a, 8, levels=1, cb_size=(8, 8))
    assert enc[:2] == b"\xff\x4f"  # SOC
    assert enc[2:4] == b"\xff\x51"  # SIZ
    lsiz = struct.unpack(">H", enc[4:6])[0]
    assert lsiz == 41  # 38 + 3·Csiz for one component
    xsiz, ysiz = struct.unpack(">II", enc[8:16])
    assert (xsiz, ysiz) == (4, 3)
    csiz = struct.unpack(">H", enc[40:42])[0]
    assert csiz == 1
    assert enc[-2:] == b"\xff\xd9"  # EOC


def test_unsupported_profiles_raise():
    a = np.zeros((4, 4), np.int64)
    enc = bytearray(encode_j2k(a, 8, 1, (8, 8)))
    # flip the transform byte (last SPcod octet) to 0 → 9/7 irreversible
    # with a style-0 (no-quantization) QCD: an inconsistent stream
    cod_at = bytes(enc).find(b"\xff\x52")
    ln = struct.unpack(">H", enc[cod_at + 2 : cod_at + 4])[0]
    bad = bytearray(enc)
    bad[cod_at + 2 + ln - 1] = 0
    with pytest.raises(ValueError, match="scalar quantization"):
        decode_j2k(bytes(bad))
    # and the reverse mismatch: a lossy stream relabelled reversible
    lossy = bytearray(
        encode_j2k(a + 3, 8, 1, (8, 8), irreversible=True)
    )
    cod_at = bytes(lossy).find(b"\xff\x52")
    ln = struct.unpack(">H", lossy[cod_at + 2 : cod_at + 4])[0]
    lossy[cod_at + 2 + ln - 1] = 1
    with pytest.raises(ValueError, match="scalar quantization"):
        decode_j2k(bytes(lossy))
    with pytest.raises(ValueError, match="SOC"):
        decode_j2k(b"\x00\x00" + bytes(enc[2:]))
    with pytest.raises(ValueError, match="truncated|JPEG2000"):
        decode_j2k(bytes(enc[: len(enc) // 2]))


# ----------------------------------------------------- GRIB2 template 5.40


def _j2k_grib2(xs, ni, nj, nbits=12, levels=2, **kw):
    payload = encode_j2k(
        np.asarray(xs, np.int64).reshape(nj, ni), nbits, levels=levels,
        cb_size=(64, 64),
    )
    return make_grib2(
        list(xs),
        ni,
        nj,
        nbits=nbits,
        drs_template=40,
        data_override=payload,
        sec5_extra=bytes([0, 255]),  # lossless, target ratio missing
        **kw,
    )


def test_grib2_jpeg2000_template_decodes():
    from open_energy_data_server_spark.sources.grib2codec import decode_grib2

    rng = np.random.default_rng(42)
    ni, nj = 20, 15
    walk = np.cumsum(rng.integers(-5, 6, size=ni * nj)) + 2000
    xs = np.clip(walk, 0, 4095).astype(np.int64)
    msg = _j2k_grib2(xs, ni, nj, r_ref=250.0, e_scale=1, d_scale=1)
    df = decode_grib2(msg)
    assert len(df) == ni * nj
    expect = (250.0 + xs.astype(np.float64) * 2.0) / 10.0
    np.testing.assert_allclose(np.sort(df["value"].values), np.sort(expect))


def test_grib2_jpeg2000_matches_simple_packing():
    from open_energy_data_server_spark.sources.grib2codec import decode_grib2

    xs = [7, 0, 255, 33, 99, 128]
    simple = decode_grib2(make_grib2(xs, ni=3, nj=2, nbits=8))
    j2k = decode_grib2(_j2k_grib2(xs, 3, 2, nbits=8, levels=1))
    for col in ("latitude", "longitude", "value"):
        np.testing.assert_allclose(
            np.sort(simple[col].values), np.sort(j2k[col].values)
        )


def test_grib2_jpeg2000_lossy_decodes():
    """Template 5.40 compression type 1 (lossy 9/7): values land
    within the quantization step of the exact scaled integers."""
    from open_energy_data_server_spark.sources.grib2codec import decode_grib2

    rng = np.random.default_rng(17)
    ni, nj = 16, 12
    walk = np.cumsum(rng.integers(-6, 7, size=ni * nj)) + 800
    xs = np.clip(walk, 0, 2047).astype(np.int64)
    payload = encode_j2k(
        xs.reshape(nj, ni), 11, levels=2, cb_size=(64, 64),
        irreversible=True,
    )
    msg = make_grib2(
        list(xs), ni, nj, nbits=11, drs_template=40,
        data_override=payload,
        sec5_extra=bytes([1, 50]),  # lossy compression type + ratio
        r_ref=100.0, e_scale=0, d_scale=1,
    )
    df = decode_grib2(msg)
    assert len(df) == ni * nj
    expect = (100.0 + xs.astype(np.float64)) / 10.0
    # near-lossless config: scaled-integer error ≤ 3 → ≤ 0.3 in units
    got = np.sort(df["value"].values)
    np.testing.assert_allclose(got, np.sort(expect), atol=0.3)
    assert np.abs(got - np.sort(expect)).max() > 0  # genuinely lossy path


def test_grib2_jpeg2000_unknown_compression_type_raises():
    from open_energy_data_server_spark.sources.grib2codec import decode_grib2

    xs = [1, 2, 3, 4]
    msg = make_grib2(
        xs, ni=2, nj=2, nbits=8, drs_template=40,
        data_override=encode_j2k(np.array(xs, np.int64).reshape(2, 2), 8, 0, (8, 8)),
        sec5_extra=bytes([7, 50]),  # compression type 7: not a thing
    )
    with pytest.raises(ValueError, match="compression type"):
        decode_grib2(msg)


def test_grib2_jpeg2000_wrong_count_raises():
    from open_energy_data_server_spark.sources.grib2codec import decode_grib2

    xs = [1, 2, 3, 4, 5, 6]
    payload = encode_j2k(np.arange(4, dtype=np.int64).reshape(2, 2), 8, 0, (8, 8))
    msg = make_grib2(
        xs, ni=3, nj=2, nbits=8, drs_template=40,
        data_override=payload, sec5_extra=bytes([0, 255]),
    )
    with pytest.raises(ValueError, match="JPEG2000|samples"):
        decode_grib2(msg)


def test_spark_read_grib_jpeg2000_distributed(spark, tmp_path):
    """Template 5.40 through read_grib's distributed path."""
    from open_energy_data_server_spark.sources.grib import read_grib

    rng = np.random.default_rng(9)
    ni, nj = 12, 8
    d = tmp_path / "j2k"
    d.mkdir()
    fields = {}
    for hour in (0, 6):
        xs = rng.integers(0, 1023, size=ni * nj).astype(np.int64)
        msg = _j2k_grib2(
            xs, ni, nj, nbits=10, r_ref=2500.0, e_scale=0, d_scale=1,
            forecast_hours=hour,
        )
        (d / f"f{hour:03d}.grib2").write_bytes(msg)
        fields[hour] = xs
    df = read_grib(spark, str(d / "*.grib2")).collect()
    assert len(df) == 2 * ni * nj
    by_time = {}
    for row in df:
        by_time.setdefault(row.time.hour, []).append(row.value)
    for hour, xs in fields.items():
        expect = (2500.0 + xs.astype(np.float64)) / 10.0
        # ref time 03:00 + lead 0h/6h → valid hours 3 and 9
        np.testing.assert_allclose(
            np.sort(by_time[3 + hour]), np.sort(expect)
        )


# ------------------------------------------------- 9/7 irreversible path


def test_lift97_constant_signal():
    """CDF 9/7 analysis of a constant: low band carries the constant
    exactly (after the 1/K normalization), high band vanishes."""
    from open_energy_data_server_spark.sources.j2kcodec import (
        _fwd_lift97_axis,
    )

    f = _fwd_lift97_axis(np.full((1, 16), 7.0))
    np.testing.assert_allclose(f[..., 0::2], 7.0, atol=1e-12)
    np.testing.assert_allclose(f[..., 1::2], 0.0, atol=1e-12)


@settings(max_examples=25, deadline=None)
@given(
    h=st.integers(1, 40),
    w=st.integers(2, 40),
    levels=st.integers(0, 3),
    seed=st.integers(0, 2**31),
)
def test_dwt97_roundtrip_property(h, w, levels, seed):
    from open_energy_data_server_spark.sources.j2kcodec import (
        _fdwt97,
        _idwt97,
    )

    rng = np.random.default_rng(seed)
    a = rng.normal(scale=200.0, size=(h, w))
    ll, bands = _fdwt97(a, levels)
    np.testing.assert_allclose(_idwt97(ll, bands), a, atol=1e-8)


@pytest.mark.parametrize("style", ["expounded", "derived"])
def test_lossy_roundtrip_near_lossless(style):
    """eps_shift=0 puts every step at Δ_b = 2^gain·(1+μ/2048): the
    reconstruction error is a few integer steps at most."""
    rng = np.random.default_rng(3)
    img = np.clip(
        np.cumsum(rng.integers(-4, 5, size=(24, 31)), axis=1) + 512,
        0, 1023,
    ).astype(np.int64)
    enc = encode_j2k(
        img, 10, levels=2, irreversible=True, quant_style=style,
    )
    dec = decode_j2k(enc)
    assert dec.shape == img.shape
    bound = 3 if style == "expounded" else 6  # derived coarsens per level
    assert np.abs(dec - img).max() <= bound


def test_lossy_quantization_error_scales_with_step():
    """Coarser steps (eps_shift) shrink the stream and bound the error
    by the synthesis-propagated step size."""
    rng = np.random.default_rng(11)
    img = np.clip(
        np.cumsum(rng.integers(-4, 5, size=(24, 31)), axis=1) + 512,
        0, 1023,
    ).astype(np.int64)
    sizes, errs = [], []
    for shift in (0, 2, 4):
        enc = encode_j2k(
            img, 10, levels=2, irreversible=True, eps_shift=shift,
        )
        sizes.append(len(enc))
        errs.append(int(np.abs(decode_j2k(enc) - img).max()))
    assert sizes[0] > sizes[1] > sizes[2]
    # error grows with Δ = 2^shift but stays within a few steps
    assert errs[2] <= (1 << 4) * 3
    assert errs[1] <= (1 << 2) * 3
    assert errs[0] <= 3


def test_lossy_mantissa_step():
    """A non-zero 11-bit mantissa widens Δ_b by (1 + μ/2048) on both
    sides identically — the round-trip stays within the same bound."""
    rng = np.random.default_rng(23)
    img = rng.integers(0, 4096, size=(17, 13), dtype=np.int64)
    enc = encode_j2k(
        img, 12, levels=1, irreversible=True, mantissa=1024,  # Δ ×1.5
    )
    dec = decode_j2k(enc)
    assert np.abs(dec - img).max() <= 5


def test_lossy_signed_component():
    rng = np.random.default_rng(7)
    img = rng.integers(-500, 500, size=(12, 19), dtype=np.int64)
    enc = encode_j2k(img, 11, levels=2, signed=True, irreversible=True)
    dec = decode_j2k(enc)
    assert np.abs(dec - img).max() <= 3


def test_lossy_marker_layout():
    """COD transform byte 0 and the QCD style bits per Annex A."""
    img = np.arange(64, dtype=np.int64).reshape(8, 8)
    for style, want_style, pairs in (
        ("expounded", 2, 3 * 1 + 1),
        ("derived", 1, 1),
    ):
        enc = encode_j2k(
            img, 8, levels=1, irreversible=True, quant_style=style,
        )
        cod_at = enc.find(b"\xff\x52")
        ln = struct.unpack(">H", enc[cod_at + 2 : cod_at + 4])[0]
        assert enc[cod_at + 2 + ln - 1] == 0  # 9/7 transform
        qcd_at = enc.find(b"\xff\x5c")
        qln = struct.unpack(">H", enc[qcd_at + 2 : qcd_at + 4])[0]
        sqcd = enc[qcd_at + 4]
        assert sqcd & 0x1F == want_style
        assert qln - 2 - 1 == 2 * pairs  # 16-bit ε/μ entries


@settings(max_examples=12, deadline=None)
@given(
    h=st.integers(1, 24),
    w=st.integers(1, 24),
    levels=st.integers(0, 2),
    prec=st.integers(4, 14),
    seed=st.integers(0, 2**31),
)
def test_lossy_roundtrip_property(h, w, levels, prec, seed):
    rng = np.random.default_rng(seed)
    img = rng.integers(0, 1 << prec, size=(h, w), dtype=np.int64)
    enc = encode_j2k(
        img, prec, levels=levels, cb_size=(32, 32), irreversible=True,
    )
    dec = decode_j2k(enc)
    assert dec.shape == img.shape
    assert np.abs(dec - img).max() <= 4


def test_spark_read_grib_jpeg2000_lossy_distributed(spark, tmp_path):
    """Template 5.40 compression type 1 (lossy 9/7) through
    read_grib's distributed path: values within the documented
    near-lossless tolerance of the exact field."""
    from open_energy_data_server_spark.sources.grib import read_grib

    rng = np.random.default_rng(41)
    ni, nj = 14, 10
    d = tmp_path / "j2k_lossy"
    d.mkdir()
    xs = np.clip(
        np.cumsum(rng.integers(-5, 6, size=ni * nj)) + 1000, 0, 2047
    ).astype(np.int64)
    payload = encode_j2k(
        xs.reshape(nj, ni), 11, levels=2, cb_size=(64, 64),
        irreversible=True,
    )
    msg = make_grib2(
        list(xs), ni, nj, nbits=11, drs_template=40,
        data_override=payload, sec5_extra=bytes([1, 40]),
        r_ref=0.0, e_scale=0, d_scale=0,
    )
    (d / "lossy.grib2").write_bytes(msg)
    rows = read_grib(spark, str(d / "*.grib2")).collect()
    assert len(rows) == ni * nj
    got = np.sort(np.array([r.value for r in rows]))
    np.testing.assert_allclose(got, np.sort(xs.astype(np.float64)), atol=3)


# ----------------------------------------------- multi-layer codestreams


@pytest.mark.parametrize("layers", [2, 3, 5])
@pytest.mark.parametrize("prog", ["lrcp", "rlcp"])
def test_multilayer_lossless_roundtrip(layers, prog):
    """Quality layers split each code-block's pass sequence across
    packets — the decoder's incremental-inclusion, per-layer npasses
    and lblock-growth paths (untested before the encoder could emit
    layers). Reassembly must be bit-exact."""
    rng = np.random.default_rng(layers * 7 + (prog == "rlcp"))
    img = rng.integers(0, 4096, size=(33, 27), dtype=np.int64)
    enc = encode_j2k(
        img, 12, levels=2, cb_size=(16, 16), layers=layers, progression=prog
    )
    assert np.array_equal(decode_j2k(enc), img)


def test_multilayer_deferred_inclusion():
    """A code block with a single coding pass lands in a LATE layer
    (prefix split gives early layers zero passes): the inclusion tag
    tree must defer across packets and resolve at the right layer."""
    img = np.zeros((20, 20), np.int64)
    img[17, 3] = 1  # one nonzero in the last code-block row
    enc = encode_j2k(img, 8, levels=1, cb_size=(8, 8), layers=4)
    assert np.array_equal(decode_j2k(enc), img)


def test_multilayer_lossy_roundtrip():
    rng = np.random.default_rng(13)
    img = np.clip(
        np.cumsum(rng.integers(-4, 5, size=(24, 31)), axis=1) + 512,
        0, 1023,
    ).astype(np.int64)
    for layers in (2, 4):
        enc = encode_j2k(
            img, 10, levels=2, irreversible=True, layers=layers,
        )
        assert np.abs(decode_j2k(enc) - img).max() <= 3


@settings(max_examples=15, deadline=None)
@given(
    h=st.integers(1, 24),
    w=st.integers(1, 24),
    levels=st.integers(0, 2),
    layers=st.integers(1, 6),
    seed=st.integers(0, 2**31),
)
def test_multilayer_roundtrip_property(h, w, levels, layers, seed):
    rng = np.random.default_rng(seed)
    img = rng.integers(0, 1 << 10, size=(h, w), dtype=np.int64)
    enc = encode_j2k(
        img, 10, levels=levels, cb_size=(8, 8), layers=layers,
    )
    assert np.array_equal(decode_j2k(enc), img)


# -------------------------------------------------- multi-tile codestreams


@pytest.mark.parametrize(
    ("tile", "parts"),
    [((16, 16), 1), ((32, 20), 1), ((20, 40), 3), ((16, 16), 3)],
)
def test_multitile_lossless_roundtrip(tile, parts):
    """Origin-anchored tile grids (SOT per tile, raster order) with
    optional tile-part splitting: each tile decodes independently
    (tile-scoped tag trees / code-block state) and reassembles
    bit-exactly, including ragged edge tiles."""
    rng = np.random.default_rng(tile[0] * 100 + parts)
    img = rng.integers(0, 4096, size=(37, 53), dtype=np.int64)
    enc = encode_j2k(
        img, 12, 2, (16, 16), tile_size=tile, tile_parts=parts,
    )
    assert np.array_equal(decode_j2k(enc), img)


def test_multitile_layers_rlcp_and_lossy():
    rng = np.random.default_rng(5)
    img = rng.integers(0, 4096, size=(37, 53), dtype=np.int64)
    enc = encode_j2k(
        img, 12, 2, (16, 16), tile_size=(20, 20), layers=3,
        progression="rlcp", tile_parts=2,
    )
    assert np.array_equal(decode_j2k(enc), img)
    smooth = np.clip(
        np.cumsum(rng.integers(-4, 5, size=(30, 41)), axis=1) + 512, 0, 1023
    ).astype(np.int64)
    enc = encode_j2k(
        smooth, 10, 2, irreversible=True, tile_size=(16, 24), tile_parts=2,
    )
    assert np.abs(decode_j2k(enc) - smooth).max() <= 3


def test_multitile_marker_layout():
    """SIZ carries the tile grid; one SOT per (tile, tile-part) with
    correct isot/tpsot/tnsot and self-consistent Psot."""
    img = np.arange(24 * 40, dtype=np.int64).reshape(24, 40) % 256
    enc = encode_j2k(img, 8, 1, (8, 8), tile_size=(20, 20), tile_parts=2)
    xtsiz, ytsiz = struct.unpack(">II", enc[24:32])
    assert (xtsiz, ytsiz) == (20, 20)
    sots = []
    pos = enc.find(b"\xff\x90")
    while pos != -1:
        lsot, isot, psot, tpsot, tnsot = struct.unpack(
            ">HHIBB", enc[pos + 2 : pos + 12]
        )
        sots.append((isot, tpsot, tnsot))
        pos = enc.find(b"\xff\x90", pos + psot)
    # 2x2 tile grid (40x24 at 20x20) × 2 tile-parts each
    assert sots == [
        (t, p, 2) for t in range(4) for p in range(2)
    ]


def test_multitile_missing_tile_raises():
    """A codestream whose tile grid promises more tiles than its
    SOT segments deliver must fail loudly."""
    img = np.arange(64, dtype=np.int64).reshape(8, 8)
    enc = bytearray(encode_j2k(img, 8, 1, (8, 8), tile_size=(4, 8)))
    # drop the second tile: truncate after the first tile's Psot + EOC
    first_sot = bytes(enc).find(b"\xff\x90")
    psot = struct.unpack(">I", enc[first_sot + 6 : first_sot + 10])[0]
    bad = bytes(enc[: first_sot + psot]) + b"\xff\xd9"
    with pytest.raises(ValueError, match="has no tile-part"):
        decode_j2k(bad)


# ------------------------------------ precincts / SOP-EPH / RPCL / POC


@pytest.mark.parametrize(
    "prec",
    [(6, 6), (5, 7), (7, 5), [(4, 4), (5, 5), (6, 6)]],
)
def test_precinct_lossless_roundtrip(prec):
    """User-defined precincts (COD Scod bit 0): packets go per
    precinct with per-precinct-band tag trees and the effective
    code-block clamped to the precinct band — bit-exact round-trip
    across uniform and per-resolution precinct grids."""
    rng = np.random.default_rng(41)
    img = rng.integers(0, 4096, size=(90, 130), dtype=np.int64)
    enc = encode_j2k(img, 12, 2, (16, 16), precincts=prec)
    assert np.array_equal(decode_j2k(enc), img)


def test_precinct_clamps_codeblock():
    """A precinct smaller than the code-block must shrink the
    effective block (2^(PPx-1) in subbands): cb 64 with PPx=PPy=4
    → 8×8 blocks; the stream still round-trips."""
    rng = np.random.default_rng(43)
    img = rng.integers(0, 1024, size=(48, 80), dtype=np.int64)
    enc = encode_j2k(img, 10, 2, (64, 64), precincts=(4, 4))
    assert np.array_equal(decode_j2k(enc), img)


def test_precinct_lossy_multilayer_multitile():
    """Precincts compose with the rest of the surface: 9/7 lossy ×
    3 layers × RLCP × 2×2 tile grid × tile-parts, all precincted."""
    rng = np.random.default_rng(47)
    smooth = np.clip(
        np.cumsum(rng.integers(-4, 5, size=(45, 60)), axis=1) + 512, 0, 1023
    ).astype(np.int64)
    enc = encode_j2k(
        smooth, 10, 2, (16, 16), irreversible=True, layers=3,
        progression="rlcp", tile_size=(32, 24), tile_parts=2,
        precincts=(5, 5),
    )
    assert np.abs(decode_j2k(enc) - smooth).max() <= 3


def test_precinct_cod_marker_layout():
    """Scod bit 0 set and one (PPy<<4 | PPx) byte per resolution."""
    img = np.arange(16 * 16, dtype=np.int64).reshape(16, 16) % 256
    enc = encode_j2k(img, 8, 2, (8, 8), precincts=[(4, 5), (5, 6), (6, 7)])
    cod_at = enc.find(b"\xff\x52")
    body = enc[cod_at + 4 :]
    assert body[0] & 0x01  # Scod bit 0: user precincts
    assert list(body[10:13]) == [(5 << 4) | 4, (6 << 4) | 5, (7 << 4) | 6]


def test_sop_eph_markers_on_wire():
    """SOP frames every packet with an incrementing counter; EPH
    terminates every packet header — counts must equal the packet
    count (layers × Σ precincts) and the stream still round-trips."""
    rng = np.random.default_rng(53)
    img = rng.integers(0, 4096, size=(64, 64), dtype=np.int64)
    layers, levels = 2, 2
    enc = encode_j2k(
        img, 12, levels, (16, 16), layers=layers, precincts=(5, 5),
        sop=True, eph=True,
    )
    cod_at = enc.find(b"\xff\x52")
    assert enc[cod_at + 4] & 0x06 == 0x06  # Scod bits 1+2
    # 64×64, levels=2: res dims 16/32/64 → precincts (5,5): 1, 1, 4
    n_pkts = layers * (1 + 1 + 4)
    assert enc.count(b"\xff\x91\x00\x04") == n_pkts
    assert enc.count(b"\xff\x92") == n_pkts
    sops = []
    pos = enc.find(b"\xff\x91\x00\x04")
    while pos != -1:
        sops.append(struct.unpack(">H", enc[pos + 4 : pos + 6])[0])
        pos = enc.find(b"\xff\x91\x00\x04", pos + 6)
    assert sops == list(range(n_pkts))
    assert np.array_equal(decode_j2k(enc), img)


def test_rpcl_progression_roundtrip():
    rng = np.random.default_rng(59)
    img = rng.integers(0, 4096, size=(70, 90), dtype=np.int64)
    enc = encode_j2k(
        img, 12, 2, (16, 16), layers=3, progression="rpcl",
        precincts=(5, 5),
    )
    cod_at = enc.find(b"\xff\x52")
    assert enc[cod_at + 5] == 2  # RPCL on the wire
    assert np.array_equal(decode_j2k(enc), img)


def test_poc_roundtrip_and_marker():
    """POC volumes: low resolutions LRCP for the first two layers,
    then the rest RPCL — the packet stream follows the volumes in
    order (first volume wins) and the POC marker carries the
    (RSpoc, CSpoc, LYEpoc, REpoc, CEpoc, Ppoc) entries."""
    rng = np.random.default_rng(61)
    img = rng.integers(0, 4096, size=(90, 130), dtype=np.int64)
    enc = encode_j2k(
        img, 12, 2, (16, 16), layers=3, precincts=(6, 6),
        poc=[(0, 2, 2, "lrcp"), (0, 3, 3, "rpcl")],
    )
    poc_at = enc.find(b"\xff\x5f")
    assert poc_at != -1
    ln = struct.unpack(">H", enc[poc_at + 2 : poc_at + 4])[0]
    assert ln == 2 + 14  # two 7-byte entries
    assert enc[poc_at + 4 : poc_at + 11] == struct.pack(
        ">BBHBBB", 0, 0, 2, 2, 1, 0
    )
    assert np.array_equal(decode_j2k(enc), img)


def test_poc_gap_rejected():
    """POC volumes that do not cover every packet desynchronize all
    later headers — the decoder must refuse loudly, not misdecode."""
    rng = np.random.default_rng(67)
    img = rng.integers(0, 256, size=(32, 32), dtype=np.int64)
    enc = bytearray(
        encode_j2k(img, 8, 1, (16, 16), layers=2,
                   poc=[(0, 2, 1, "lrcp"), (1, 2, 2, "lrcp")])
    )
    # shrink the second volume's REpoc so resolution 1 loses coverage:
    # entry 2 starts 7 bytes into the POC body
    poc_at = bytes(enc).find(b"\xff\x5f")
    assert enc[poc_at + 4 + 7 + 4] == 2  # REpoc of entry 2
    enc[poc_at + 4 + 7 + 4] = 1
    with pytest.raises(ValueError, match="POC volumes cover"):
        decode_j2k(bytes(enc))


def test_missing_eph_rejected():
    rng = np.random.default_rng(71)
    img = rng.integers(0, 256, size=(24, 24), dtype=np.int64)
    enc = bytearray(encode_j2k(img, 8, 1, (8, 8), eph=True))
    at = bytes(enc).find(b"\xff\x92")
    enc[at] = 0x00  # corrupt the first EPH
    with pytest.raises(ValueError, match="EPH"):
        decode_j2k(bytes(enc))


def test_precinct_zero_exponent_subband_rejected():
    """PPx/PPy = 0 at r > 0 implies a half-sample precinct band —
    both encoder and decoder refuse."""
    img = np.zeros((16, 16), np.int64)
    with pytest.raises(ValueError, match="PPx/PPy"):
        encode_j2k(img, 8, 1, (8, 8), precincts=[(4, 4), (0, 4)])
    # decoder side: patch a valid stream's COD precinct byte to 0
    enc = bytearray(encode_j2k(img, 8, 1, (8, 8), precincts=(4, 4)))
    cod_at = bytes(enc).find(b"\xff\x52")
    enc[cod_at + 4 + 11] = 0  # r=1 precinct byte
    with pytest.raises(ValueError, match="PPx/PPy"):
        decode_j2k(bytes(enc))


def test_pcrl_progression_rejected():
    img = np.zeros((16, 16), np.int64)
    enc = bytearray(encode_j2k(img, 8, 1, (8, 8)))
    cod_at = bytes(enc).find(b"\xff\x52")
    enc[cod_at + 5] = 3  # PCRL
    with pytest.raises(ValueError, match="progression order 3"):
        decode_j2k(bytes(enc))
