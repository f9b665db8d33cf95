"""JPEG2000 codec tests (grid/jpeg2000.py).

Layered: MQ coder round-trips, tag trees, 5/3 DWT (against a direct
non-lifting evaluation written here, independent of the module), EBCOT
tier-1 code-blocks, then full codestream round-trips and the GRIB2
template 5.40 integration.
"""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from monitoring_data_ingestion_spark.grid.jpeg2000 import (
    MQDecoder,
    MQEncoder,
    N_CTX,
)


# --------------------------------------------------------------------------
# MQ coder
# --------------------------------------------------------------------------


def _mq_roundtrip(pairs):
    enc = MQEncoder()
    for d, cx in pairs:
        enc.encode(d, cx)
    data = enc.flush()
    dec = MQDecoder(data)
    return data, [dec.decode(cx) for _, cx in pairs]


def test_mq_roundtrip_fixed_patterns():
    for pattern in (
        [(0, 0)] * 100,
        [(1, 0)] * 100,
        [(i & 1, 0) for i in range(257)],
        [((i * 7) % 3 == 0, (i * 5) % N_CTX) for i in range(1000)],
        [(1, 18)],  # single LPS in the UNIFORM context
        [],
    ):
        pairs = [(int(d), int(cx)) for d, cx in pattern]
        _, decoded = _mq_roundtrip(pairs)
        assert decoded == [d for d, _ in pairs]


def test_mq_compresses_biased_sequences():
    """A heavily biased source must compress far below 1 bit/symbol —
    catches a coder that round-trips but never adapts."""
    rng = np.random.default_rng(7)
    bits = (rng.random(8000) < 0.02).astype(int)
    pairs = [(int(b), 5) for b in bits]
    data, decoded = _mq_roundtrip(pairs)
    assert decoded == [int(b) for b in bits]
    assert len(data) < 8000 // 16  # < 0.5 bit/symbol

def test_mq_incompressible_sequence_near_one_bit():
    rng = np.random.default_rng(11)
    bits = (rng.random(4000) < 0.5).astype(int)
    pairs = [(int(b), 3) for b in bits]
    data, decoded = _mq_roundtrip(pairs)
    assert decoded == [int(b) for b in bits]
    # the MQ coder has a few % overhead on incompressible input
    assert len(data) <= int(4000 / 8 * 1.10)


@settings(max_examples=200, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(0, 1), st.integers(0, N_CTX - 1)),
        max_size=400,
    )
)
def test_mq_roundtrip_property(pairs):
    _, decoded = _mq_roundtrip(pairs)
    assert decoded == [d for d, _ in pairs]


def test_mq_codeword_never_ends_with_ff_and_never_embeds_marker():
    rng = np.random.default_rng(3)
    for trial in range(50):
        n = int(rng.integers(1, 600))
        pairs = [
            (int(rng.integers(0, 2)), int(rng.integers(0, N_CTX)))
            for _ in range(n)
        ]
        enc = MQEncoder()
        for d, cx in pairs:
            enc.encode(d, cx)
        data = enc.flush()
        assert not data or data[-1] != 0xFF
        for i in range(len(data) - 1):
            if data[i] == 0xFF:
                assert data[i + 1] <= 0x8F  # no marker-lookalike pairs


# --------------------------------------------------------------------------
# Packet-header bit I/O
# --------------------------------------------------------------------------


def test_bit_io_roundtrip_with_stuffing():
    from monitoring_data_ingestion_spark.grid.jpeg2000 import (
        _BitReader,
        _BitWriter,
    )

    rng = np.random.default_rng(17)
    for trial in range(60):
        n = int(rng.integers(0, 200))
        # all-ones blocks force 0xFF bytes and exercise the stuffing
        bits = (
            [1] * n
            if trial % 3 == 0
            else [int(b) for b in rng.integers(0, 2, n)]
        )
        bw = _BitWriter()
        for b in bits:
            bw.put(b)
        data = bw.flush()
        for i in range(len(data) - 1):
            if data[i] == 0xFF:
                assert data[i + 1] < 0x80  # stuffed MSB
        assert not data or data[-1] != 0xFF
        br = _BitReader(data)
        assert [br.get() for _ in bits] == bits
        br.align()
        assert br.pos == len(data)  # trailing-0xFF stuffing consumed


# --------------------------------------------------------------------------
# Tag trees
# --------------------------------------------------------------------------


def _tagtree_pair(w, h):
    from monitoring_data_ingestion_spark.grid.jpeg2000 import TagTree

    return TagTree(w, h), TagTree(w, h)


@settings(max_examples=60, deadline=None)
@given(
    st.integers(1, 7),
    st.integers(1, 7),
    st.integers(0, 2**32 - 1),
)
def test_tagtree_full_value_roundtrip(w, h, seed):
    from monitoring_data_ingestion_spark.grid.jpeg2000 import (
        _BitReader,
        _BitWriter,
    )

    rng = np.random.default_rng(seed)
    values = rng.integers(0, 9, (h, w))
    enc_tree, dec_tree = _tagtree_pair(w, h)
    for y in range(h):
        for x in range(w):
            enc_tree.set(x, y, int(values[y, x]))
    enc_tree.finalize()
    bw = _BitWriter()
    order = [(x, y) for y in range(h) for x in range(w)]
    for x, y in order:
        enc_tree.encode(bw, x, y, int(values[y, x]) + 1)
    br = _BitReader(bw.flush())
    for x, y in order:
        t = 1
        while not dec_tree.decode(br, x, y, t):
            t += 1
        assert t - 1 == values[y, x]


def test_tagtree_partial_threshold_roundtrip():
    """Inclusion-style usage: a single threshold-1 query per leaf only
    reveals whether the value is 0 — and consumes identical bits on
    both sides."""
    from monitoring_data_ingestion_spark.grid.jpeg2000 import (
        _BitReader,
        _BitWriter,
    )

    rng = np.random.default_rng(23)
    for _ in range(40):
        w, h = int(rng.integers(1, 6)), int(rng.integers(1, 6))
        values = rng.integers(0, 2, (h, w))
        enc_tree, dec_tree = _tagtree_pair(w, h)
        for y in range(h):
            for x in range(w):
                enc_tree.set(x, y, int(values[y, x]))
        enc_tree.finalize()
        bw = _BitWriter()
        for y in range(h):
            for x in range(w):
                enc_tree.encode(bw, x, y, 1)
        br = _BitReader(bw.flush())
        for y in range(h):
            for x in range(w):
                assert dec_tree.decode(br, x, y, 1) == (values[y, x] == 0)


# --------------------------------------------------------------------------
# 5/3 DWT — against a direct per-sample evaluation of the lifting
# equations over an explicitly extended signal, written here without
# numpy slicing tricks (independent of the module's vectorization).
# --------------------------------------------------------------------------


def _ext_index(i, n):
    """Whole-sample symmetric extension index."""
    while not 0 <= i < n:
        i = -i if i < 0 else 2 * (n - 1) - i
    return i


def _direct_53(x):
    n = len(x)

    def a(i):
        return int(x[_ext_index(i, n)])

    def hval(j):  # high-pass sample at odd extended position j
        return a(j) - (a(j - 1) + a(j + 1)) // 2

    low = [
        a(p) + (hval(p - 1) + hval(p + 1) + 2) // 4
        for p in range(0, n, 2)
    ]
    high = [hval(p) for p in range(1, n, 2)]
    return low, high


@settings(max_examples=150, deadline=None)
@given(st.lists(st.integers(-(2**20), 2**20), min_size=1, max_size=24))
def test_dwt_1d_matches_direct_evaluation(xs):
    from monitoring_data_ingestion_spark.grid.jpeg2000 import (
        _fwd53_last_axis,
        _inv53_last_axis,
    )

    x = np.array(xs, dtype=np.int64)
    lo, hi = _fwd53_last_axis(x)
    if len(xs) > 1:
        dlo, dhi = _direct_53(xs)
        assert lo.tolist() == dlo
        assert hi.tolist() == dhi
    assert _inv53_last_axis(lo, hi, len(xs)).tolist() == xs


@settings(max_examples=60, deadline=None)
@given(
    st.integers(1, 20),
    st.integers(1, 20),
    st.integers(0, 4),
    st.integers(0, 2**32 - 1),
)
def test_dwt_2d_perfect_reconstruction(h, w, levels, seed):
    from monitoring_data_ingestion_spark.grid.jpeg2000 import (
        dwt2_forward,
        dwt2_inverse,
    )

    rng = np.random.default_rng(seed)
    a = rng.integers(-(2**15), 2**15, (h, w))
    ll, detail = dwt2_forward(a, levels)
    assert np.array_equal(dwt2_inverse(ll, detail, (h, w)), a)


# --------------------------------------------------------------------------
# EBCOT tier-1
# --------------------------------------------------------------------------


@settings(max_examples=80, deadline=None)
@given(
    st.integers(1, 9),
    st.integers(1, 9),
    st.sampled_from(["LL", "HL", "LH", "HH"]),
    st.integers(0, 2**32 - 1),
    st.sampled_from([1, 40, 3000]),
)
def test_codeblock_roundtrip_property(h, w, band, seed, scale):
    from monitoring_data_ingestion_spark.grid.jpeg2000 import (
        _decode_codeblock,
        _encode_codeblock,
    )

    rng = np.random.default_rng(seed)
    a = rng.integers(-scale, scale + 1, (h, w))
    data, k, npasses = _encode_codeblock(a, band)
    assert np.array_equal(
        _decode_codeblock(data, h, w, k, npasses, band), a
    )


def test_codeblock_sparse_and_full_size():
    from monitoring_data_ingestion_spark.grid.jpeg2000 import (
        _decode_codeblock,
        _encode_codeblock,
    )

    rng = np.random.default_rng(31)
    # 64x64 (full code-block) with clustered support exercises the
    # run-length mode and stripe transitions
    a = np.zeros((64, 64), dtype=np.int64)
    a[10:13, 40:44] = rng.integers(-1000, 1000, (3, 4))
    a[63, 0] = -7
    data, k, npasses = _encode_codeblock(a, "HL")
    assert np.array_equal(_decode_codeblock(data, 64, 64, k, npasses, "HL"), a)
    # all-zero block is not included at all
    z, k0, n0 = _encode_codeblock(np.zeros((8, 8), dtype=np.int64), "LL")
    assert (z, k0, n0) == (b"", 0, 0)


# --------------------------------------------------------------------------
# Full codestream
# --------------------------------------------------------------------------


@settings(max_examples=40, deadline=None)
@given(
    st.integers(1, 40),
    st.integers(1, 40),
    st.sampled_from([1, 2, 8, 13]),
    st.integers(0, 2**32 - 1),
)
def test_codestream_roundtrip_property(h, w, depth, seed):
    from monitoring_data_ingestion_spark.grid.jpeg2000 import (
        j2k_decode,
        j2k_encode,
    )

    rng = np.random.default_rng(seed)
    a = rng.integers(0, 1 << depth, (h, w), dtype=np.int64)
    back, d = j2k_decode(j2k_encode(a, depth))
    assert d == depth
    assert np.array_equal(back, a)


def test_codestream_multi_codeblock_and_compression():
    from monitoring_data_ingestion_spark.grid.jpeg2000 import (
        j2k_decode,
        j2k_encode,
    )

    # > 64 on both axes → 4 code-blocks per full-res subband
    grad = (np.add.outer(np.arange(100), np.arange(130)) % 251).astype(
        np.int64
    )
    buf = j2k_encode(grad, 8)
    back, _ = j2k_decode(buf)
    assert np.array_equal(back, grad)
    assert len(buf) < grad.size // 4  # smooth field must compress

    rng = np.random.default_rng(7)
    noise = rng.integers(0, 256, (100, 130), dtype=np.int64)
    buf_n = j2k_encode(noise, 8)
    assert np.array_equal(j2k_decode(buf_n)[0], noise)
    assert len(buf_n) > len(buf)  # noise must not


def test_codestream_zero_and_constant_fields():
    from monitoring_data_ingestion_spark.grid.jpeg2000 import (
        j2k_decode,
        j2k_encode,
    )

    for a in (
        np.zeros((9, 17), dtype=np.int64),
        np.full((9, 17), 5, dtype=np.int64),
    ):
        assert np.array_equal(j2k_decode(j2k_encode(a, 8))[0], a)


def test_codestream_rejects_unsupported_options():
    from monitoring_data_ingestion_spark.grid.jpeg2000 import (
        j2k_decode,
        j2k_encode,
    )

    a = np.arange(12, dtype=np.int64).reshape(3, 4)
    buf = bytearray(j2k_encode(a, 4))

    with pytest.raises(ValueError, match="SOC"):
        j2k_decode(b"\x00\x00" + bytes(buf[2:]))

    def patched(off, val):
        b = bytearray(buf)
        b[off] = val
        return bytes(b)

    siz_seg = 2 + 4  # SOC + marker/len → first SIZ param byte
    cod_off = 2 + 2 + 41  # SOC + SIZ(marker+Lsiz=41)
    # transform byte (last of SPcod) = cod_off + 4 + 9
    with pytest.raises(ValueError, match="9/7"):
        j2k_decode(patched(cod_off + 13, 0))
    # code-block style
    with pytest.raises(ValueError, match="style"):
        j2k_decode(patched(cod_off + 12, 0x01))
    # Scod: precincts/SOP
    with pytest.raises(ValueError, match="precinct|SOP"):
        j2k_decode(patched(cod_off + 4, 0x02))
    # signed component (Ssiz sign bit): SIZ param offset 36
    with pytest.raises(ValueError, match="signed"):
        j2k_decode(patched(siz_seg + 36, 0x83))
    # component count
    with pytest.raises(ValueError, match="components"):
        j2k_decode(patched(siz_seg + 35, 3))
    # truncation
    with pytest.raises(ValueError):
        j2k_decode(bytes(buf[: len(buf) // 2]))

    with pytest.raises(ValueError, match="bit depth"):
        j2k_encode(a, 30)
    with pytest.raises(ValueError, match="range"):
        j2k_encode(a, 3)  # 11 needs 4 bits


def test_decode_rejects_oversize_single_precinct_dims():
    """A conformant codestream wider than 2^15 has multiple precincts
    per resolution under the default grid; reading it as one packet
    would desync tier-2 — the decoder must reject as loudly as the
    encoder does (review r8)."""
    import struct

    from monitoring_data_ingestion_spark.grid.jpeg2000 import (
        j2k_decode,
        j2k_encode,
    )

    buf = bytearray(j2k_encode(np.arange(12, dtype=np.int64).reshape(3, 4), 4))
    struct.pack_into(">I", buf, 8, 40000)  # SIZ Xsiz
    struct.pack_into(">I", buf, 24, 40000)  # SIZ XTsiz (keep untiled)
    with pytest.raises(ValueError, match="single-precinct"):
        j2k_decode(bytes(buf))
